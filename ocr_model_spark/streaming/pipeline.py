"""Structured Streaming surface (SURVEY.md §2.10).

The reference's "stream" is a Celery task queue, not a data stream, so there
is no watermark/window semantics to replicate — but the engine exposes the
same batch pipeline incrementally:

  * :func:`streaming_extraction` — ``readStream`` over the pages table,
    ``trigger(availableNow=True)``, the SAME extraction transformations
    (one lazy plan, batch/streaming agnostic), ``foreachBatch`` committing
    each micro-batch with lineage — exactly-once resume falls out of the
    content-hash anti-join inside the batch writer.
  * :func:`streaming_windowed_counts` — watermarked tumbling-window agg over
    the events table (the generic streaming-analytics pattern, verified
    against a DuckDB ``date_trunc`` oracle).

Both run synchronously to completion in tests via ``availableNow`` +
``processAllAvailable`` — the sandbox substitute for a long-lived stream.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_model_spark.operators.extract import doc_summary, extract_pages
from ocr_model_spark.sources.pages import PAGES_SCHEMA


def streaming_windowed_counts(
    spark: SparkSession, events_path: str, window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts/sums per event_type over a stream of events.

    Returns the COMPLETE materialized result (the stream is drained with
    availableNow) as a static DataFrame: (window_start, event_type, n,
    sum_value)."""
    import os

    # window() computes over TIMESTAMP (ltz): pin the session TZ to UTC for
    # the duration so the NTZ→LTZ casts are value-preserving regardless of
    # the caller's session configuration (oracle comparisons depend on it)
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    schema = spark.read.parquet(events_path).schema
    name = f"win_counts_{uuid.uuid4().hex[:8]}"  # sink name only, not data
    # the file stream source requires a directory: stream the parent dir
    # filtered to this table's file
    parent, base = os.path.split(events_path.rstrip("/"))
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", base)
        .parquet(parent)
        # watermarks need TIMESTAMP (ltz); session TZ is UTC so the cast is
        # value-preserving, and we cast back on output for the oracle
        .withColumn("ts", F.col("ts").cast("timestamp_ltz"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value") + 1e-9, 4).alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    try:
        q = (
            stream.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table(name)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def streaming_dedup_counts(spark: SparkSession, docs_path: str) -> DataFrame:
    """Stateful streaming exact-dedup (the training-pipeline pattern: drop
    re-crawled duplicate documents as they ARRIVE, not in a nightly batch):
    ``dropDuplicates`` on (source, content-hash) keeps first-seen rows in
    state, then per-source unique counts. Drained with availableNow; at
    real scale the state is bounded with ``dropDuplicatesWithinWatermark``
    once the source carries event time. Keyed per (source, hash) so the
    result is deterministic regardless of arrival order. Verified against
    the batch ``COUNT(DISTINCT text)`` oracle."""
    import os

    schema = spark.read.parquet(docs_path).schema
    name = f"dedup_counts_{uuid.uuid4().hex[:8]}"  # sink name only, not data
    parent, base = os.path.split(docs_path.rstrip("/"))
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", base)
        .parquet(parent)
        # NULL text is excluded (not hashed as ''): the batch
        # COUNT(DISTINCT text) oracle ignores NULLs, and '' must not
        # collide with missing
        .filter(F.col("text").isNotNull())
        .select("source", F.sha2(F.col("text"), 256).alias("h"))
        .dropDuplicates(["source", "h"])
        .groupBy("source")
        .agg(F.count("*").alias("n_unique_docs"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def streaming_extraction(
    spark: SparkSession, pages_path: str, out_dir: str
) -> None:
    """Run the extraction pipeline as an incremental stream: each micro-batch
    goes through the same ``extract_pages`` plan and is committed with its
    per-partition lineage (north-rule resume granularity = micro-batch)."""
    from ocr_model_spark.pipeline import commit_snapshot, partition_lineage

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        docs = extract_pages(batch_df)
        commit_snapshot(
            {"docs": docs, "lineage": partition_lineage(docs)}, out_dir
        )

    import os

    reader = spark.readStream.schema(PAGES_SCHEMA)
    if os.path.isfile(pages_path):
        # the file stream source requires a directory
        parent, base_name = os.path.split(pages_path.rstrip("/"))
        reader = reader.option("pathGlobFilter", base_name)
        pages_path = parent
    q = (
        reader.parquet(pages_path)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        # sibling dir: the snapshot writer owns out_dir and would clobber a
        # checkpoint nested inside it
        .option("checkpointLocation", f"{out_dir.rstrip('/')}_checkpoint")
        .start()
    )
    q.awaitTermination()
