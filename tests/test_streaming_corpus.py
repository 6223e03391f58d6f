"""Streaming incremental corpus: micro-batch extract → gate → exact +
cross-corpus LSH dedup → append; checkpoint resume is a no-op."""

from __future__ import annotations

import glob
import os
import shutil

from ocr_model_spark.sources.pages import PAGES_SCHEMA
from ocr_model_spark.sources.synth import materialize_pages
from ocr_model_spark.streaming.pipeline import streaming_corpus


def _one_parquet_file(spark, rows, out_dir, dest):
    spark.createDataFrame(rows, PAGES_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(out_dir)
    part = glob.glob(os.path.join(out_dir, "part-*.parquet"))[0]
    shutil.copy(part, dest)


def test_streaming_corpus_incremental_dedup(spark, tmp_path):
    src = materialize_pages("/root/testdata/sf0.001", str(tmp_path), n_pages=130)
    rows = spark.read.parquet(src).collect()
    b1, fresh = rows[:100], rows[100:130]

    # batch-2 adversaries: near-dup copies (payload + trailing HTML comment
    # -> new content hash, identical extracted text) and exact cross-batch
    # copies (same payload, new url -> same content hash)
    near, exact = [], []
    for r in b1:
        d = r.asDict()
        if d["html"] is not None and bytes(d["html"][:1]) == b"<" and len(near) < 20:
            nd = dict(d)
            nd["html"] = bytes(d["html"]) + b"<!-- near-dup -->"
            nd["url"] = d["url"] + "?v=2"
            near.append(tuple(nd[f.name] for f in PAGES_SCHEMA.fields))
        elif len(exact) < 5:
            ed = dict(d)
            ed["url"] = d["url"] + "?copy"
            exact.append(tuple(ed[f.name] for f in PAGES_SCHEMA.fields))
    assert len(near) == 20 and len(exact) == 5

    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    _one_parquet_file(spark, b1, str(tmp_path / "w1"), str(stream_dir / "b1.parquet"))
    b2 = [tuple(r[f.name] for f in PAGES_SCHEMA.fields) for r in fresh] + near + exact
    _one_parquet_file(spark, b2, str(tmp_path / "w2"), str(stream_dir / "b2.parquet"))
    now = os.path.getmtime(str(stream_dir / "b2.parquet"))
    os.utime(str(stream_dir / "b1.parquet"), (now - 100, now - 100))

    out = str(tmp_path / "corpus")
    streaming_corpus(spark, str(stream_dir), out, max_files_per_trigger=1)

    corpus = spark.read.parquet(out)
    urls = {r["url"] for r in corpus.select("url").collect()}
    input_urls = {r["url"] for r in b1} | {r["url"] for r in fresh}
    assert urls <= input_urls  # every adversarial copy was dropped
    assert not any(u.endswith("?v=2") or u.endswith("?copy") for u in urls)
    assert urls & {r["url"] for r in fresh}  # new content DID append
    # the standing corpus stays exact-duplicate-free across batches
    assert corpus.groupBy("content_sha256").count().filter("count > 1").count() == 0

    # checkpoint resume: a second availableNow run sees no new files and
    # appends nothing
    n = corpus.count()
    streaming_corpus(spark, str(stream_dir), out, max_files_per_trigger=1)
    assert spark.read.parquet(out).count() == n
