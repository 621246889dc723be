"""Sources & sinks: synthetic pages generator, parquet-manifest catalog,
lineage/checkpoint table (resume = left_anti join, SURVEY.md §2.3 J4)."""
