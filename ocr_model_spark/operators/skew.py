"""Skew-defusing two-stage (salted) aggregation.

Crawl corpora are host-skewed (a handful of domains carry a large share of
all pages — the synth corpus reproduces this with a Zipf host pool). A
plain ``groupBy(host)`` shuffles every row of the hot host into ONE reduce
partition. For algebraic aggregates Spark's map-side partial aggregation
usually absorbs this, but the protection evaporates when the map side
can't combine (high-cardinality secondary grouping, first-seen semantics,
memory-capped partial maps under ``spark.sql.objectHashAggregate``
fallbacks) — and it never existed for order-sensitive/holistic aggregates.

``salted_aggregate`` makes the two-stage shape EXPLICIT and deterministic:

    stage 1: groupBy(keys, salt)  — the hot key spreads over ``buckets``
             reduce partitions (salt = pmod(xxhash64(salt_src), buckets),
             a pure function of the row, never rand());
    stage 2: groupBy(keys)        — combines ``buckets`` partial rows per
             key: reduce-side load is O(buckets), not O(rows-of-hot-key).

At 10^12 rows the stage-2 input is |keys| x buckets rows — trivially
small — while stage 1 is balanced by construction. Supported ops are the
algebraic ones whose partials combine losslessly (sum/count/min/max).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": lambda c: F.sum(c),
    "count": lambda c: F.count(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
# how stage 2 combines stage-1 partials
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    specs: list[tuple[str, Column | str, str]],
    salt_src: Column | str = "url",
    buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: ``specs`` is ``[(op, expr, alias)]`` with op
    in {sum, count, min, max}. ``salt_src`` seeds the deterministic salt
    (any column that distributes within a key — the url within a host)."""
    bad = [op for op, _e, _a in specs if op not in _PARTIAL]
    if bad:
        raise ValueError(f"unsupported salted ops {bad}; use {sorted(_PARTIAL)}")
    salt = F.pmod(F.xxhash64(salt_src), F.lit(buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*keys, "_salt")
        .agg(*[_PARTIAL[op](expr).alias(alias) for op, expr, alias in specs])
    )
    return partial.groupBy(*keys).agg(
        *[_COMBINE[op](alias).alias(alias) for op, _expr, alias in specs]
    )


def host_ingest_counters_batch(pages_df: DataFrame, buckets: int = 16) -> DataFrame:
    """Batch twin of the streaming stateful crawl monitor
    (streaming/stateful.py:host_ingest_counters): identical per-host
    (docs, failures, bytes) totals, computed with the salted two-stage
    aggregation so the Zipf-hot host cannot pile one reduce partition."""
    from ocr_model_spark.operators.dispatch import doc_type_col
    from ocr_model_spark.operators.urls import url_host

    slim = pages_df.select(
        "url",
        url_host("url").alias("url_host"),
        # same failure rule as the streaming operator: non-extractable type
        # ('doc' = sniff-refined Word CFB, extractable since round 6)
        (~doc_type_col(F.col("html")).isin("pdf", "html", "text", "docx", "doc", "xls", "ppt"))
        .cast("long")
        .alias("failed"),
        F.coalesce(F.length("html"), F.lit(0)).cast("long").alias("n_bytes"),
    )
    return salted_aggregate(
        slim,
        ["url_host"],
        [
            # count(1), not count(url): COUNT(*) semantics — a NULL url row
            # still counts, matching both the oracle and the streaming twin
            ("count", F.lit(1), "total_docs"),
            ("sum", "failed", "total_failed"),
            ("sum", "n_bytes", "total_bytes"),
        ],
        salt_src="url",
        buckets=buckets,
    )
