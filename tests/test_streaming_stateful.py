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