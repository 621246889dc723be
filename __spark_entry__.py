"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship main-content extraction over pages
synthesized from /root/testdata/sf0.001 (schema per BASELINE.json
input_hint). ``queries()``/``oracle_sql()`` expose one entry per implemented
operator family from SURVEY.md §2 plus the training-data-pipeline operators;
see ocr_spark/contract.py for the matched-semantics notes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ocr_spark import contract


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(contract.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(contract.ORACLE_SQL)
