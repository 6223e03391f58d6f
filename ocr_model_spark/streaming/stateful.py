"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no event-stream state (its queue is per-document), but the
engine's streaming surface needs one custom stateful operator for crawl
monitoring: **running per-host ingest counters** — for each url_host, the
cumulative (docs, failures, bytes) across ALL micro-batches, emitted once
per batch the host appears in. This is state Spark's built-in windowed aggs
can't express incrementally in update mode with arbitrary logic, which is
exactly the ``applyInPandasWithState`` niche.

State schema is a single struct row per host. By default counters never
expire (exactly matching the batch oracle); an optional ``idle_timeout_ms``
switches to ProcessingTimeTimeout and EVICTS hosts idle past the TTL —
evicted hosts restart from zero if they reappear, so downstream consumers
of a TTL'd stream must treat counters as frontier-scoped, not monotone.
Works under ``availableNow`` for tests and under a real trigger in
production (a TTL'd query keeps firing empty timer batches — see the test
for the drain pattern).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url_host", T.StringType()),
        T.StructField("total_docs", T.LongType()),
        T.StructField("total_failed", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("total_docs", T.LongType()),
        T.StructField("total_failed", T.LongType()),
        T.StructField("total_bytes", T.LongType()),
    ]
)


def _update_host(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    idle_timeout_ms: int | None = None,
) -> Iterator[pd.DataFrame]:
    # TTL eviction: a host idle past the timeout gets its state dropped
    # and emits nothing — at crawl scale #hosts is ~10^8-10^9 and counters
    # for long-dead hosts are pure state bloat; downstream snapshots
    # already persisted their last emission
    if idle_timeout_ms is not None and state.hasTimedOut:
        state.remove()
        return
    docs = failed = nbytes = 0
    for pdf in pdfs:
        docs += len(pdf)
        failed += int((~pdf["ok"]).sum())
        nbytes += int(pdf["n_bytes"].sum())
    if state.exists:
        pd_, pf_, pb_ = state.get
        docs, failed, nbytes = docs + pd_, failed + pf_, nbytes + pb_
    state.update((docs, failed, nbytes))
    if idle_timeout_ms is not None:
        state.setTimeoutDuration(idle_timeout_ms)
    yield pd.DataFrame(
        [
            {
                "url_host": key[0],
                "total_docs": docs,
                "total_failed": failed,
                "total_bytes": nbytes,
            }
        ]
    )


def host_ingest_counters(
    pages_stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """streaming pages(url, html, …) → per-host cumulative counters.

    ``pages_stream`` must be a STREAMING DataFrame with url + html columns;
    the projection to (host, ok-ish flag, byte count) happens JVM-side —
    only three narrow columns reach the stateful python stage.

    ``idle_timeout_ms``: optional TTL — hosts idle past it are EVICTED
    (ProcessingTimeTimeout; the timed-out invocation removes state and
    emits nothing). Default None = counters never expire, matching the
    batch oracle exactly; at 10^8-host crawl scale set a TTL so state
    tracks the live frontier instead of every host ever seen."""
    from ocr_model_spark.operators.dispatch import doc_type_col
    from ocr_model_spark.operators.urls import url_host

    slim = pages_stream.select(
        url_host("url").alias("url_host"),
        # extractable types (mirrors the gate in operators/extract.py)
        doc_type_col(F.col("html"))
        .isin("pdf", "html", "text", "docx", "doc", "xls", "ppt")
        .alias("ok"),
        F.coalesce(F.length("html"), F.lit(0)).cast("long").alias("n_bytes"),
    )
    if idle_timeout_ms is None:
        fn, timeout = _update_host, GroupStateTimeout.NoTimeout
    else:
        def fn(key, pdfs, state):  # bind the TTL; signature stays 3-arg
            return _update_host(key, pdfs, state, idle_timeout_ms)

        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return slim.groupBy("url_host").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
