"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline on sf0.001;
``queries()`` exposes every implemented operator family from SURVEY.md §2
(plus the training-data suite); ``oracle_sql()`` gives a DuckDB oracle for
EVERY query (round 3: zero rows-only entries) — recomputing ANSI SQL where
expressible, committed snapshot pins (``expected/``, regenerated via
``python -m tools.make_expected``) for the pandas-UDF extraction / ANN /
WARC family whose deterministic outputs SQL cannot re-derive.
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
