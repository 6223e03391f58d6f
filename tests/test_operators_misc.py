"""Operators not covered by the oracle-parity suite: ensemble merge,
multimodal decode plumbing, streaming extraction, driver contract."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_ensemble_merge_keeps_max_confidence(spark):
    from ocr_model_spark.operators.tokens import ensemble_merge

    cols = ["url", "page_num", "text", "x1", "y1", "x2", "y2", "confidence", "engine"]
    eng1 = spark.createDataFrame(
        [("u", 1, "Hello", 0.0, 0.0, 10.0, 5.0, 0.8, "tesseract"),
         ("u", 1, "World", 12.0, 0.0, 20.0, 5.0, 0.9, "tesseract")],
        cols,
    )
    eng2 = spark.createDataFrame(
        [("u", 1, "Hello", 0.0, 0.0, 10.0, 5.0, 0.95, "paddle")],
        cols,
    )
    out = ensemble_merge([eng1, eng2]).orderBy("text").collect()
    assert len(out) == 2
    hello = [r for r in out if r["text"] == "Hello"][0]
    assert hello["confidence"] == 0.95 and hello["engine"] == "paddle"


def test_multimodal_media_meta_deterministic(spark, pages_path):
    from ocr_model_spark.operators.multimodal import media_metadata

    pages = spark.read.parquet(pages_path)
    images = pages.filter(F.substring("html", 1, 8) == F.lit(b"\x89PNG\r\n\x1a\n"))
    a = media_metadata(images).orderBy("url").toPandas()
    b = media_metadata(images).orderBy("url").toPandas()
    assert len(a) > 0
    assert (a["format"] == "png").all()
    assert a.equals(b)
    assert (a["decoder"] == "fake").all()  # stub marked, plumbing real


def test_streaming_extraction_commits_snapshot(spark, pages_path, tmp_path):
    from ocr_model_spark.streaming.pipeline import streaming_extraction

    out = str(tmp_path / "stream_snap")
    # pages_path is a multi-file dataset directory — stream it directly
    streaming_extraction(spark, pages_path, out)
    snap = spark.read.parquet(out)
    assert snap.count() == 300
    lin = spark.read.parquet(out + "/_lineage")
    assert lin.agg(F.sum("n_docs")).first()[0] == 300


def test_driver_contract(spark):
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(oracles) >= 20
    df = e.entry(spark)
    assert df.count() > 0
    # stable schema: re-invocation yields the same columns
    assert e.entry(spark).columns == df.columns


def test_image_quality_filter_reasons(spark):
    from ocr_model_spark.operators.multimodal import image_quality_filter

    rows = [
        ("a", 320, 240, 5000),
        ("b", 10, 240, 5000),     # too-small width
        ("c", 2000, 80, 5000),    # degenerate aspect (25:1)
        ("d", 100, 100, 8),       # too few bytes
    ]
    df = spark.createDataFrame(rows, "url STRING, width INT, height INT, n_bytes LONG")
    out = {r["url"]: (r["keep"], r["drop_reason"]) for r in image_quality_filter(df).collect()}
    assert out["a"] == (True, None)
    assert out["b"] == (False, "too-small")
    assert out["c"] == (False, "degenerate-aspect")
    assert out["d"] == (False, "too-few-bytes")


def test_ivf_kmeans_training_is_deterministic(spark):
    from ocr_model_spark.operators.similarity import ivf_train_kmeans

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").selectExpr(
        "vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS embedding"
    )
    a = ivf_train_kmeans(emb, n_centroids=16, iters=1)
    b = ivf_train_kmeans(emb, n_centroids=16, iters=1)
    assert a == b  # grouped-map means sum in sorted-id order: bitwise stable
    assert len(a) == 16 and all(len(c) == 64 for c in a)
    # refinement actually moves centroids off the seed vectors
    from ocr_model_spark.operators.similarity import _seed_centroids

    seeds = _seed_centroids(emb, 16, "vec_id", "embedding")
    assert a != seeds
