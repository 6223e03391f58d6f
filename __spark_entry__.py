"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes every implemented operator family from SURVEY.md §2
(plus the training-data suite); ``oracle_sql()`` gives the DuckDB twin for
each SQL-expressible query (identical column names + rounding). Extraction /
streaming-extraction / ANN / multimodal entries are rows-only by design
(pandas-UDF kernels and approximate ops are not ANSI-SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ocr_model_spark.entry import all_oracles, all_queries, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return all_oracles()
