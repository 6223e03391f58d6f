"""Streaming near-duplicate marking: MinHash-LSH banding on ARRIVAL.

The batch near-dup pipeline (``operators/dedup.py``) answers "which pairs
are near-dups"; a training-data INGEST pipeline needs the streaming form:
as each crawled document arrives, is it a near-duplicate of anything seen
before? Design:

  1. signature IN ROW — the pure-Python kernel twin
     (``kernels/minhash.py``) runs inside an Arrow-batched pandas UDF, so
     the fat text never shuffles and no streaming aggregation is needed;
  2. explode to (band, key) rows JVM-side (4 short keys per doc);
  3. ``applyInPandasWithState`` keyed on the band key: state holds the
     smallest doc id seen in the bucket; every OTHER member emits a
     flagged row. One stateful shuffle on a short key — the same
     plan shape the batch LSH uses, made incremental.

Semantics: a doc is flagged iff a bucket-mate with a SMALLER id exists —
arrival-order-free, so the result equals the batch rule and the DuckDB
oracle reproduces it exactly (``entry.streaming_near_dup_oracle_sql``).
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ocr_model_spark.kernels.minhash import N_BANDS, ROWS_PER_BAND

_SIG_TYPE = T.ArrayType(T.LongType())

_FLAG_SCHEMA = T.StructType([T.StructField("doc_id", T.LongType())])
_STATE_SCHEMA = T.StructType([T.StructField("min_id", T.LongType())])


@pandas_udf(_SIG_TYPE)
def _signature_udf(text: pd.Series) -> pd.Series:
    from ocr_model_spark.kernels.minhash import minhash_signature

    return text.map(lambda t: minhash_signature(t if t is not None else ""))


def _flag_bucket(key: tuple, pdfs, state: GroupState):
    """Emit every bucket member except the smallest id ever seen; keep the
    running minimum in state. With smallest-id-wins semantics the flag set
    is independent of batch boundaries EXCEPT that an earlier-batch
    minimum later dethroned would itself need flagging — handled by
    emitting the dethroned previous minimum too."""
    ids: set[int] = set()
    for pdf in pdfs:
        ids.update(int(x) for x in pdf["doc_id"])
    prev_min = state.get[0] if state.exists else None
    new_min = min(ids) if prev_min is None else min(prev_min, min(ids))
    state.update((new_min,))
    flagged = sorted(i for i in ids if i != new_min)
    if prev_min is not None and prev_min != new_min:
        flagged.append(prev_min)  # dethroned: now has a smaller bucket-mate
    if flagged:
        yield pd.DataFrame({"doc_id": flagged})


def streaming_near_dup_flags(spark: SparkSession, docs_path: str) -> DataFrame:
    """documents stream → (doc_id, is_near_dup) for every document.

    Returns the drained (availableNow) result as a static DataFrame."""
    import os

    schema = spark.read.parquet(docs_path).schema
    parent, base = os.path.split(docs_path.rstrip("/"))
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", base)
        .parquet(parent)
        .select("doc_id", _signature_udf(F.col("text")).alias("sig"))
    )
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
        lambda b: F.struct(
            b.alias("band"),
            F.concat_ws(
                "_",
                *[
                    F.element_at("sig", (b * ROWS_PER_BAND + r + 1).cast("int")).cast(
                        "string"
                    )
                    for r in range(ROWS_PER_BAND)
                ],
            ).alias("key"),
        ),
    )
    banded = stream.select(
        "doc_id", F.explode(bands).alias("bk")
    ).select(
        "doc_id",
        F.concat_ws(":", F.col("bk.band").cast("string"), F.col("bk.key")).alias(
            "bucket"
        ),
    )
    flagged = banded.groupBy("bucket").applyInPandasWithState(
        _flag_bucket,
        outputStructType=_FLAG_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"neardup_{uuid.uuid4().hex[:8]}"  # sink name only, not data
    q = (
        flagged.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    flags = spark.table(name).distinct()
    docs = spark.read.parquet(docs_path).select("doc_id")
    return docs.join(
        flags.withColumn("is_near_dup", F.lit(True)), "doc_id", "left"
    ).select("doc_id", F.coalesce("is_near_dup", F.lit(False)).alias("is_near_dup"))
