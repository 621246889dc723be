"""Job plans: SparkSession builder + the flagship extraction pipeline."""
