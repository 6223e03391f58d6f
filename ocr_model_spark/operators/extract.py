"""The vectorized extraction operator: pages → extracted docs → region rows.

Wraps the pure kernel :func:`ocr_model_spark.kernels.extract.extract_document`
in a scalar pandas UDF (Arrow-batched, Series→DataFrame-of-struct) — the ONLY
place per-document Python runs. Everything before (type sniff, gating,
hashing) and after (explode, ids, provenance, aggregation) is JVM-side
expression code so whole-stage codegen applies.

Determinism contract (north rule, byte-identical text per url):
  * region ids are ``sha2(url || ':' || idx)`` — no uuid4
    (replaces ``worker/types.py:76``);
  * timestamps come from the input ``warc_ts``, never wall clock
    (replaces ``document_processor.py:166``);
  * the kernel itself is a pure function of the payload bytes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ocr_model_spark.operators.dispatch import doc_type_col, gated_transform

REGION_TYPE = T.StructType(
    [
        T.StructField("idx", T.IntegerType()),
        T.StructField("type", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("span_start", T.LongType()),
        T.StructField("span_end", T.LongType()),
        T.StructField("link_density", T.DoubleType()),
        T.StructField("text_density", T.DoubleType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("needs_review", T.BooleanType()),
    ]
)

EXTRACT_TYPE = T.StructType(
    [
        T.StructField("doc_type", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("encoding", T.StringType()),
        T.StructField("ok", T.BooleanType()),
        T.StructField("error", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("regions", T.ArrayType(REGION_TYPE)),
        # kernel wall-time per document (microseconds) — the ONLY
        # nondeterministic field; never selected by oracled/pinned queries,
        # consumed by bench.py's per-doc-type cost breakdown
        T.StructField("elapsed_us", T.LongType()),
    ]
)

_FIELDS = [f.name for f in EXTRACT_TYPE.fields]
_REGION_KEYS = [f.name for f in REGION_TYPE.fields]


@pandas_udf(EXTRACT_TYPE)
def extract_udf(html: pd.Series) -> pd.DataFrame:
    """Arrow-batched extraction: one kernel call per document in the batch."""
    import gc

    # the kernel is allocation-heavy and produces no reference cycles;
    # cyclic-GC sweeps cost ~15-20% of the stage (measured) — disable in the
    # (reused) python worker
    gc.disable()
    from ocr_model_spark.kernels.extract import extract_document

    from time import perf_counter_ns

    rows = []
    for payload in html:
        t0 = perf_counter_ns()
        r = extract_document(bytes(payload) if payload is not None else None)
        r["elapsed_us"] = (perf_counter_ns() - t0) // 1000
        r["regions"] = [{k: reg[k] for k in _REGION_KEYS} for reg in r["regions"]]
        rows.append({k: r[k] for k in _FIELDS})
    return pd.DataFrame(rows, columns=_FIELDS)


def _empty_extract_struct(doc_type: Column, error: str) -> Column:
    """Pure-expression extract result for rows the kernel never sees."""
    return F.struct(
        doc_type.alias("doc_type"),
        F.lit("").alias("text"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("encoding"),
        F.lit(False).alias("ok"),
        F.lit(error).alias("error"),
        F.lit(None).cast(T.MapType(T.StringType(), T.StringType())).alias("metadata"),
        F.lit(None).cast(T.ArrayType(REGION_TYPE)).alias("regions"),
        F.lit(0).cast("long").alias("elapsed_us"),
    )


def extract_pages(pages: DataFrame) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → one row per document with the
    extraction struct, content hash, and provenance. Drops ``html``
    immediately after the kernel (fat binary must not cross a shuffle).

    The kernel UDF is predicate-gated: image/unknown payloads (which the
    engine cannot extract in this build) never reach Python — they are
    finished by a pure-expression branch (``gated_transform``).
    """
    # input_file must be captured at scan time (callers add it before any
    # shuffle — see pipeline.run_extraction); partition_id is the processing
    # partition, taken here
    input_file = (
        F.col("input_file") if "input_file" in pages.columns else F.input_file_name()
    )
    base = pages.withColumn("doc_type_sniffed", doc_type_col(F.col("html"))).withColumn(
        "provenance",
        F.struct(
            input_file.alias("input_file"),
            F.spark_partition_id().alias("partition_id"),
        ),
    )
    # 'doc'/'xls'/'ppt' = CFB refined by stream markers (sniff) — all three
    # extract hot; bare 'ole' now means CFB *without* a doc/xls/ppt stream
    # marker (.msg, unknown junk) and stays on the cold typed-failure path
    extractable = F.col("doc_type_sniffed").isin(
        "pdf", "html", "text", "docx", "doc", "xls", "ppt"
    )

    def hot(df: DataFrame) -> DataFrame:
        return df.withColumn("extracted", extract_udf(F.col("html")))

    def cold(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "extracted",
            _empty_extract_struct(F.col("doc_type_sniffed"), "engine-unavailable"),
        )

    out = gated_transform(base, extractable, hot, cold)
    return out.select(
        "url",
        "warc_ts",
        "lang",
        F.sha2(F.col("html"), 256).alias("content_sha256"),
        F.col("extracted.doc_type").alias("doc_type"),
        F.col("extracted.ok").alias("ok"),
        F.col("extracted.error").alias("error"),
        F.col("extracted.encoding").alias("encoding"),
        F.col("extracted.title").alias("title"),
        F.col("extracted.text").alias("text_extracted"),
        F.col("extracted.metadata").alias("metadata"),
        F.col("extracted.regions").alias("regions"),
        F.col("extracted.elapsed_us").alias("extract_us"),
        "provenance",
    )


def region_rows(docs: DataFrame) -> DataFrame:
    """Explode extracted docs into the flat Row model
    (``worker/types.py:132-140`` re-expressed columnar; FIXTURES.md §5)."""
    r = docs.select(
        "url",
        "warc_ts",
        "doc_type",
        "content_sha256",
        "provenance",
        F.posexplode_outer("regions").alias("pos", "region"),
    ).filter(F.col("region").isNotNull())
    return r.select(
        F.sha2(F.concat_ws(":", F.col("url"), F.col("region.idx")), 256).alias("row_id"),
        "url",
        "warc_ts",
        "doc_type",
        F.lit(1).alias("page"),
        F.sha2(F.concat_ws(":", F.col("url"), F.lit("r"), F.col("region.idx")), 256).alias(
            "region_id"
        ),
        F.col("region.idx").alias("region_idx"),
        F.col("region.type").alias("region_type"),
        F.col("region.text").alias("text"),
        F.col("region.span_start").alias("span_start"),
        F.col("region.span_end").alias("span_end"),
        F.col("region.link_density").alias("link_density"),
        F.col("region.text_density").alias("text_density"),
        F.col("region.confidence").alias("confidence"),
        F.col("region.needs_review").alias("needs_review"),
        "content_sha256",
        "provenance",
    )


def doc_summary(docs: DataFrame) -> DataFrame:
    """Per-document summary metrics (``document_processor.py:791-845``):
    word/char counts, region count, avg/min confidence, review counts —
    all pure expressions over the regions array (no shuffle, no Python)."""
    text = F.col("text_extracted")
    return docs.select(
        "url",
        "warc_ts",
        "lang",
        "doc_type",
        "ok",
        "error",
        # real crawls carry secured PDFs; corpus analytics needs to count
        # them (the reference surfaces failure modes via job status)
        F.coalesce(F.col("error") == F.lit("pdf-encrypted"), F.lit(False)).alias(
            "is_encrypted"
        ),
        "title",
        "content_sha256",
        F.length(text).alias("char_count"),
        F.when(F.length(text) > 0, F.size(F.split(text, r"\s+")))
        .otherwise(F.lit(0))
        .alias("word_count"),
        F.coalesce(F.size("regions"), F.lit(0)).alias("n_regions"),
        F.aggregate(
            F.coalesce(F.col("regions"), F.array()),
            F.lit(0.0),
            lambda acc, x: acc + x["confidence"],
        ).alias("_conf_sum"),
        F.coalesce(
            F.array_min(F.transform("regions", lambda x: x["confidence"])), F.lit(None)
        ).alias("min_confidence"),
        F.size(F.filter(F.coalesce(F.col("regions"), F.array()), lambda x: x["needs_review"])).alias(
            "needs_review_count"
        ),
        "provenance",
    ).withColumn(
        "avg_confidence",
        F.when(F.col("n_regions") > 0, F.round(F.col("_conf_sum") / F.col("n_regions"), 6)),
    ).drop("_conf_sum")
