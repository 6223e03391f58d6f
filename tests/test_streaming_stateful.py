"""applyInPandasWithState: per-host cumulative counters across micro-batches."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from ocr_model_spark.operators.urls import url_host

from ocr_model_spark.sources.pages import PAGES_SCHEMA
from ocr_model_spark.streaming.stateful import host_ingest_counters


def test_host_counters_accumulate(spark, tmp_path):
    from ocr_model_spark.sources.synth import materialize_pages

    # ≥2 files so maxFilesPerTrigger=1 yields multiple micro-batches
    pages_path = materialize_pages(
        "/root/testdata/sf0.001", str(tmp_path), n_pages=1300, seed=11
    )
    name = f"hostcnt_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(PAGES_SCHEMA).option(
        "maxFilesPerTrigger", "1"  # force multiple micro-batches → state reuse
    ).parquet(pages_path)
    q = (
        host_ingest_counters(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode emits one row per (host, batch); the LAST row per host is
    # the cumulative total — compare against the batch ground truth
    out = spark.table(name).toPandas()
    final = out.groupby("url_host").max()  # counters are monotone
    truth = (
        spark.read.parquet(pages_path)
        .select(
            url_host("url").alias("url_host"),
            F.length("html").cast("long").alias("n_bytes"),
        )
        .groupBy("url_host")
        .agg(F.count("*").alias("n"), F.sum("n_bytes").alias("b"))
        .toPandas()
        .set_index("url_host")
    )
    assert len(final) == len(truth)
    for host, row in truth.iterrows():
        assert final.loc[host, "total_docs"] == row["n"], host
        assert final.loc[host, "total_bytes"] == row["b"], host
    assert (out.groupby("url_host").size() > 1).any()  # state crossed batches

def test_ttl_eviction_logic_and_stream_parity(spark, tmp_path):
    """TTL variant: (a) a timed-out invocation removes state and emits
    NOTHING (FakeGroupState unit drive — availableNow can't age state in
    one run); (b) with a generous TTL configured, the live stream's
    cumulative output matches the NoTimeout variant exactly (no timeouts
    fire, behavior identical)."""
    import pandas as pd

    from ocr_model_spark.sources.synth import materialize_pages
    from ocr_model_spark.streaming.stateful import _update_host

    class FakeState:
        def __init__(self, timed_out, existing=None):
            self.hasTimedOut = timed_out
            self._val = existing
            self.removed = False
            self.timeout_set = None

        exists = property(lambda s: s._val is not None)
        get = property(lambda s: s._val)

        def update(self, v):
            self._val = v

        def remove(self):
            self.removed = True
            self._val = None

        def setTimeoutDuration(self, ms):
            self.timeout_set = ms

    # timed-out group: state removed, nothing emitted
    st = FakeState(timed_out=True, existing=(5, 1, 100))
    rows = list(_update_host(("h",), iter([]), st, idle_timeout_ms=60000))
    assert rows == [] and st.removed

    # live group with TTL: accumulates AND re-arms the timer
    st = FakeState(timed_out=False, existing=(5, 1, 100))
    batch = pd.DataFrame({"ok": [True, False], "n_bytes": [10, 20]})
    rows = list(_update_host(("h",), iter([batch]), st, idle_timeout_ms=60000))
    assert len(rows) == 1 and st.timeout_set == 60000
    r = rows[0].iloc[0]
    assert (r["total_docs"], r["total_failed"], r["total_bytes"]) == (7, 2, 130)

    # stream parity: generous TTL ⇒ identical cumulative totals
    pages_path = materialize_pages(
        "/root/testdata/sf0.001", str(tmp_path), n_pages=600, seed=12
    )
    name = f"hostttl_{uuid.uuid4().hex[:8]}"
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(pages_path)
    # a ProcessingTimeTimeout query keeps firing empty timer batches
    # ("cleaning up state"), so neither availableNow nor
    # processAllAvailable() ever settles — poll the memory sink for the
    # full host set with a deadline, then stop explicitly
    q = (
        host_ingest_counters(stream, idle_timeout_ms=3_600_000)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .start()
    )
    truth = (
        spark.read.parquet(pages_path)
        .groupBy(url_host("url").alias("url_host"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("html").cast("long")).alias("b"),
        )
        .toPandas()
        .set_index("url_host")
    )
    import time

    try:
        deadline = time.monotonic() + 120
        final = None
        while time.monotonic() < deadline:
            got = spark.table(name).toPandas()
            if len(got) and len(got.groupby("url_host")) == len(truth):
                final = got.groupby("url_host").max()
                break
            time.sleep(1)
    finally:
        q.stop()
    assert final is not None, "TTL stream never surfaced all hosts"
    for host, row in truth.iterrows():
        assert final.loc[host, "total_docs"] == row["n"], host
        assert final.loc[host, "total_bytes"] == row["b"], host
