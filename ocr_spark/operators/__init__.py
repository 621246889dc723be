"""Spark stage operators — mapInPandas / applyInPandas / pandas_udf only.

No per-row Python UDFs anywhere (BASELINE.json input_hint); every operator
receives Arrow batches and calls the vectorized kernels in
``ocr_spark.kernels``.
"""
