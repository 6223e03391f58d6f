#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

The primary metric is extraction throughput (docs/sec over the synthesized
Common-Crawl-style pages table — the north-rule workload); per-query wall
times for the analytics suite are reported alongside.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F


def _consume(df) -> int:
    """Force FULL computation without driver-side materialization: checksum
    every column of every row. A bare count() would let Catalyst prune
    unused projections — including the extraction pandas UDF and unused
    aggregate expressions — and the benchmark would measure nothing."""
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
    # bit_xor: overflow-free combine (ANSI mode rejects sum() of longs)
    return df.select(row_hash.alias("h")).agg(F.expr("bit_xor(h)")).first()[0] or 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from ocr_model_spark.entry import pages_for
    from ocr_model_spark.pipeline import run_extraction
    from ocr_model_spark.queries import SQL_QUERIES
    from ocr_model_spark.session import get_spark

    sf = float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", "") or 0.1)
    spark = get_spark(app_name="ocr_model_spark_bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # synthesize (cached) the pages table OUTSIDE the timed section; at
    # bench scale use a corpus big enough that fixed job overhead (~1.5s)
    # doesn't dominate the throughput number
    n_pages = int(os.environ.get("BENCH_PAGES", "40000")) if sf_dir.rstrip("/").endswith(
        "sf0.1"
    ) else None
    pages_path = pages_for(sf_dir, n_pages=n_pages)
    n_pages = spark.read.parquet(pages_path).count()

    # Warm-up (BENCH_r03 regression: the driver's first run against freshly
    # regenerated synth caches recorded a 2x-slower headline — cold OS page
    # cache + python worker spawn + JIT, not a plan change). A limit(500)
    # slice is NOT enough: the pages table is few files, so a limited scan
    # touches one task and leaves 31 workers cold. Run the real extraction
    # at FULL width, untimed, so the timed best-of-2 below measures
    # steady-state throughput: (a) pre-touch every input parquet byte,
    # (b) spawn + JIT the whole worker pool on the actual UDF.
    spark.read.parquet(pages_path).agg(
        F.expr("bit_xor(xxhash64(url, html))")
    ).first()
    warm = run_extraction(spark, pages_path)
    warm["docs"].agg(
        F.count(F.lit(1)), F.sum(F.length("text_extracted"))
    ).first()

    timings: dict[str, float] = {}

    # --- decomposition passes (r5 verdict: a headline swing must be
    # attributable from the artifact ALONE). Three stacked measurements:
    #   scan_only_sec   — parquet scan + JVM-side hash of every column; no
    #                     Python. Isolates I/O + decode (host-contention
    #                     sensitive, engine-code insensitive).
    #   kernel_pass_sec — scan + Arrow transfer + the FULL extraction UDF,
    #                     but consuming only the in-UDF timer column (no
    #                     downstream assembly/checksum work).
    #   extraction_docs — the full headline pass (below).
    # kernel_cpu_sec (from the in-UDF per-doc timer, summed) divides the
    # kernel pass into python-kernel CPU vs Arrow/scheduling overhead.
    scan_work = spark.read.parquet(pages_path).agg(
        F.expr("bit_xor(xxhash64(url, warc_ts, html, text, lang))")
    )
    scan_sec = None
    for _ in range(2):
        t0 = time.perf_counter()
        scan_work.first()
        dt = time.perf_counter() - t0
        scan_sec = dt if scan_sec is None else min(scan_sec, dt)

    res = run_extraction(spark, pages_path)
    kern_work = res["docs"].agg(
        F.sum("extract_us").alias("us"), F.count(F.lit(1))
    )
    kern_sec = None
    kernel_cpu_us = 0
    for _ in range(2):
        t0 = time.perf_counter()
        kernel_cpu_us = kern_work.first()["us"] or 0
        dt = time.perf_counter() - t0
        kern_sec = dt if kern_sec is None else min(kern_sec, dt)

    # --- headline: full extraction pipeline (docs + region rows + lineage)
    # no .cache(): serializing the nested docs into the memory store costs
    # ~10× more than recomputing the (cheap, warm) extraction per consumer
    n_docs = res["docs"].count()  # cheap: UDF pruned for a bare count
    # force every pipeline column (UDF text+regions, sha2, flags) WITHOUT
    # stringifying nested structs — that cast is pure benchmark artifact
    # (measured 4x the actual pipeline cost)
    docs_work = res["docs"].agg(
        F.count(F.lit(1)),
        F.sum(F.length("text_extracted")),
        F.sum(F.size(F.coalesce(F.col("regions"), F.array()))),
        F.min("content_sha256"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)),
    )
    extract_sec = None
    for _ in range(2):  # best-of-2: steady-state throughput, not first-run jit
        t0 = time.perf_counter()
        docs_work.first()
        dt = time.perf_counter() - t0
        extract_sec = dt if extract_sec is None else min(extract_sec, dt)
    timings["extraction_docs"] = round(extract_sec, 3)
    for part in ("rows", "lineage"):
        best = None
        for _ in range(2):  # best-of-2, same rationale as the headline
            t0 = time.perf_counter()
            _consume(res[part])
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[f"extraction_{part}"] = round(best, 3)

    # --- analytics suite (one representative per operator family)
    headline = [
        "tpch_q1",
        "user_sessions",
        "token_layout_cells",
        "revenue_by_nation",
        "minhash_candidates",
        "near_dup_verified",
        "simhash",
        "cosine_topk",
        "embedding_near_dups",
        "quality_scores",
        "doc_fingerprints",
        "doc_chunks",
        "near_dup_clusters",
        "repetition_profile",
        "unigram_quality",
        "bm25_topk",
    ]
    for name in headline:
        fn, _sql = SQL_QUERIES[name]
        best = None
        for _ in range(2):  # best-of-2: the box is shared, bursts happen
            t0 = time.perf_counter()
            _consume(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # per-doc-type kernel cost (in-UDF wall micros): decomposes a headline
    # regression into payload classes right from the bench artifact
    from ocr_model_spark.pipeline import extraction_cost_by_type

    cost = {
        r["doc_type"]: {
            "n": r["n_docs"],
            "total_ms": round(r["total_us"] / 1000, 1),
            "mean_us": r["mean_us"],
        }
        for r in extraction_cost_by_type(res["docs"]).collect()
    }

    total = round(sum(timings.values()), 3)
    kernel_cpu_sec = kernel_cpu_us / 1e6
    out = {
        "metric": "extracted docs/sec (full materialization of the docs table)",
        "value": round(n_docs / extract_sec, 2),
        "unit": "docs/sec",
        "queries": timings,
        "decomposition": {
            "scan_only_sec": round(scan_sec, 3),
            "kernel_pass_sec": round(kern_sec, 3),
            "extract_full_sec": round(extract_sec, 3),
            "kernel_cpu_sec": round(kernel_cpu_sec, 3),
            "kernel_wall_ideal_sec": round(kernel_cpu_sec / int(cpus), 3),
            # kernel_pass - scan - kernel_cpu/cpus = Arrow + python-worker +
            # scheduling; extract_full - kernel_pass = downstream assembly
            "arrow_sched_overhead_sec": round(
                max(0.0, kern_sec - scan_sec - kernel_cpu_sec / int(cpus)), 3
            ),
            "downstream_sec": round(max(0.0, extract_sec - kern_sec), 3),
        },
        "cost_by_doc_type": cost,
        "sf": sf,
        "suite_seconds": total,
        "n_pages": n_pages,
        "cpus": int(cpus),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
