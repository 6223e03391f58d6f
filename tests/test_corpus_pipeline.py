"""End-to-end training-corpus pipeline: funnel totality, gate soundness,
determinism, shard-export consistency, and decontamination composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_model_spark.pipeline import build_training_corpus
from ocr_model_spark.sources.synth import materialize_pages


def test_build_training_corpus_funnel_and_export(spark, tmp_path):
    pages = materialize_pages("/root/testdata/sf0.001", str(tmp_path), n_pages=400)
    out = str(tmp_path / "corpus")
    res = build_training_corpus(spark, pages, out_dir=out, n_shards=4)

    # funnel totality: every input doc lands in exactly one bucket
    assert res["total"] == sum(res["funnel"].values()) == 400
    assert res["funnel"].get("kept", 0) > 0
    # the synthetic mix always carries some failures and some duplicates
    assert res["funnel"].get("extract_failed", 0) > 0

    # shard manifest certifies exactly the kept set
    assert res["manifest"]["total_docs"] == res["funnel"]["kept"]

    kept = spark.read.json(out)
    assert kept.count() == res["funnel"]["kept"]
    # gate soundness: every kept doc clears the quality threshold and the
    # kept set is exact-duplicate-free
    assert kept.filter(F.col("quality") < 0.3).count() == 0
    dups = kept.groupBy("content_sha256").count().filter("count > 1").count()
    assert dups == 0

    # determinism: a replay produces the identical funnel and manifest
    res2 = build_training_corpus(
        spark, pages, out_dir=str(tmp_path / "corpus2"), n_shards=4
    )
    assert res2["funnel"] == res["funnel"]
    assert res2["manifest"] == res["manifest"]


def test_build_training_corpus_decontamination(spark, tmp_path):
    pages = materialize_pages("/root/testdata/sf0.001", str(tmp_path), n_pages=300)
    res = build_training_corpus(spark, pages)
    # play back 5 kept documents as the "benchmark": identical text must
    # self-flag as contaminated on the rerun
    bench = (
        res["kept"]
        .select(F.col("url").alias("doc_id"), "text")
        .orderBy("url")
        .limit(5)
    )
    bench_urls = {r["doc_id"] for r in bench.collect()}
    res2 = build_training_corpus(spark, pages, benchmark=bench)
    assert res2["funnel"].get("contaminated", 0) >= 5
    kept_urls = {r["url"] for r in res2["kept"].select("url").collect()}
    assert not (bench_urls & kept_urls)
    # everything that newly dropped went to 'contaminated', nothing else
    # shifted (the earlier stages are independent of the benchmark)
    for stage in ("extract_failed", "url_blocked", "low_quality", "exact_dup", "near_dup"):
        assert res2["funnel"].get(stage, 0) == res["funnel"].get(stage, 0), stage
    assert res2["funnel"]["kept"] + res2["funnel"]["contaminated"] == res[
        "funnel"
    ]["kept"] + res["funnel"].get("contaminated", 0)


def test_build_training_corpus_recrawl_url_not_multiplied(spark, tmp_path):
    """A re-crawled url (same url, changed bytes) is two distinct documents
    keyed by (url x content hash): the funnel still sums to the input row
    count (review finding: joining on bare url multiplied rows and merged
    minhash signatures), and the near-identical pair resolves through the
    dedup stages rather than duplicating the export."""
    import glob as g
    import shutil

    from ocr_model_spark.sources.pages import PAGES_SCHEMA

    src = materialize_pages("/root/testdata/sf0.001", str(tmp_path), n_pages=60)
    rows = spark.read.parquet(src).collect()
    dup = next(
        r for r in rows if r["html"] is not None and bytes(r["html"][:1]) == b"<"
    ).asDict()
    dup["html"] = bytes(dup["html"]) + b"<!-- recrawl v2 -->"  # same url!
    all_rows = [tuple(r[f.name] for f in PAGES_SCHEMA.fields) for r in rows] + [
        tuple(dup[f.name] for f in PAGES_SCHEMA.fields)
    ]
    spark.createDataFrame(all_rows, PAGES_SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "w")
    )
    part = g.glob(str(tmp_path / "w" / "part-*.parquet"))[0]
    shutil.copy(part, str(tmp_path / "recrawl_pages.parquet"))

    res = build_training_corpus(spark, str(tmp_path / "recrawl_pages.parquet"))
    assert res["total"] == 61  # both versions counted, neither multiplied
    # the identical-text pair collapses in dedup: at most one side exports
    kept_urls = [r["url"] for r in res["kept"].select("url").collect()]
    assert kept_urls.count(dup["url"]) <= 1
    assert res["funnel"].get("exact_dup", 0) + res["funnel"].get("near_dup", 0) >= 1


def test_build_training_corpus_token_budget(spark, tmp_path):
    """The over_budget stage trims the kept set deterministically: a tiny
    budget drops most keepers (hash threshold, never rand()), funnel
    totality holds, every other stage count is unchanged, and replays
    keep the same documents."""
    from pyspark.sql import functions as F

    from ocr_model_spark.operators.textstats import multilingual_token_count

    pages = materialize_pages("/root/testdata/sf0.001", str(tmp_path), n_pages=300)
    base = build_training_corpus(spark, pages)
    total_tokens = (
        base["kept"]
        .agg(F.sum(multilingual_token_count(F.col("text"))).alias("t"))
        .collect()[0]["t"]
    )
    budget = total_tokens // 4
    res = build_training_corpus(spark, pages, token_budget=budget)
    assert res["total"] == base["total"] == 300
    assert res["funnel"].get("over_budget", 0) > 0
    assert (
        res["funnel"]["kept"] + res["funnel"]["over_budget"]
        == base["funnel"]["kept"]
    )
    for stage in ("extract_failed", "url_blocked", "low_quality", "exact_dup", "near_dup"):
        assert res["funnel"].get(stage, 0) == base["funnel"].get(stage, 0), stage
    # expectation-level budget: kept tokens land in a band around the
    # target (hash-threshold keeps each doc with p = budget/total)
    kept_tokens = (
        res["kept"]
        .agg(F.sum(multilingual_token_count(F.col("text"))).alias("t"))
        .collect()[0]["t"]
    )
    assert 0.5 * budget < kept_tokens < 2 * budget
    # replay determinism
    res2 = build_training_corpus(spark, pages, token_budget=budget)
    k1 = {r["doc_key"] for r in res["kept"].select("doc_key").collect()}
    k2 = {r["doc_key"] for r in res2["kept"].select("doc_key").collect()}
    assert k1 == k2
    # a budget at/above the corpus is a no-op stage
    res3 = build_training_corpus(spark, pages, token_budget=int(total_tokens))
    assert "over_budget" not in res3["funnel"]
