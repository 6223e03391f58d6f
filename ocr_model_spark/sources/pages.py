"""The primary input table: Common-Crawl-style web pages.

Driver ``input_hint`` shape: ``(url string, warc_ts timestamp, html binary,
text string, lang string)``. At production scale this is an Iceberg table
partitioned by ``days(warc_ts)``; in this sandbox it is plain parquet with
the same schema (the Iceberg catalog needs jars absent from the image, so
the catalog binding is gated — see :func:`read_pages`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def read_pages(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the pages table.

    If ``path_or_table`` looks like a catalog table name and an Iceberg
    catalog is configured, read through it (snapshot isolation, partition
    pruning on ``days(warc_ts)``); otherwise read parquet at the path.
    Schema is pinned — column pruning and predicate pushdown reach the scan
    either way.
    """
    if "/" not in path_or_table:
        try:
            return spark.read.table(path_or_table)
        except Exception:
            pass
    return spark.read.schema(PAGES_SCHEMA).parquet(path_or_table)


def write_bucketed(
    df, table: str, keys: list[str], n_buckets: int = 32, sort: bool = True
) -> None:
    """Persist a table bucketed (and sorted) on its join keys so repeated
    joins/aggregations on those keys are EXCHANGE-FREE — the co-location
    strategy for hot 100 TB join paths (pay one layout shuffle at write
    time, never again at read time). Plan-pinned by
    ``tests/test_plan_quality.py::test_bucketed_join_is_exchange_free``."""
    w = df.write.bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.mode("overwrite").saveAsTable(table)
