"""Physical-plan assertions: the properties that make the engine scale.

These guard against regressions Catalyst won't warn about: a filter that
stops reaching the scan, the extraction UDF leaking onto rows that don't
need it, or expression stages falling out of whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_model_spark.operators.extract import extract_pages
from ocr_model_spark.sources.pages import read_pages


import contextlib
import io


def _explain(df, mode: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _plan(df) -> str:
    return _explain(df, "simple")


def _formatted(df) -> str:
    return _explain(df, "formatted")


def test_filter_pushdown_reaches_parquet_scan(spark, pages_path):
    df = read_pages(spark, pages_path).filter(
        F.col("warc_ts") >= "2024-03-01 01:00:00"
    ).select("url", "warc_ts")
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(warc_ts), GreaterThanOrEqual(warc_ts" in plan
    # column pruning: html must NOT be read for a (url, warc_ts) projection
    assert "html" not in plan.split("ReadSchema:")[1].splitlines()[0]


def test_extraction_udf_is_gated(spark, pages_path):
    docs = extract_pages(spark.read.parquet(pages_path))
    plan = _plan(docs)
    # exactly one Arrow-Python stage: the hot branch; the cold branch is
    # pure expressions
    assert plan.count("ArrowEvalPython") == 1
    # the hot branch filters on the sniffed type BEFORE the UDF
    assert "unionbyname" in plan.lower() or "Union" in plan


def test_expression_queries_are_codegen(spark):
    from ocr_model_spark.queries import q_quality_scores, q_tpch_q1

    # AQE hides codegen annotations until execution — disable just for the
    # plan inspection
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _formatted(q_tpch_q1(spark, "/root/testdata/sf0.001"))
        # '*'-prefixed nodes = inside a WholeStageCodegen span
        assert "* HashAggregate" in plan and "* ColumnarToRow" in plan
        q = _formatted(q_quality_scores(spark, "/root/testdata/sf0.001"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    # text analytics stay JVM-side: vectorized scan, zero Python eval nodes
    for p in (plan, q):
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Batched: true" in q


def test_broadcast_join_chosen_for_small_dims(spark):
    from ocr_model_spark.queries import q_revenue_by_nation

    plan = _plan(q_revenue_by_nation(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_default_profile_never_shuffles_payloads(spark, pages_path):
    """Payloads never shuffle: no Exchange anywhere in the default profile's
    plan — extraction runs on scan partitions (measured: a pre-extract salt
    shuffle capped 4→16-core scaling at 0.58)."""
    from ocr_model_spark.plans.builder import build_pipeline

    for profile in ("default", "quality"):
        df = build_pipeline(profile)(read_pages(spark, pages_path))
        plan = _plan(df)
        assert "Exchange" not in plan, f"{profile} profile shuffles: {plan}"
        assert "ArrowEvalPython" in plan
    # performance profile aggregates (summary) — its one Exchange must sit
    # ABOVE the UDF in the tree (downstream of extraction), never below
    perf = _plan(build_pipeline("performance")(read_pages(spark, pages_path)))
    first_udf = perf.index("ArrowEvalPython")
    assert "Exchange" not in perf[first_udf:], "Exchange feeds the extract UDF"


def test_minhash_signature_plan_single_exchange(spark):
    """The signature pipeline pays exactly ONE shuffle (the groupBy on id):
    the shingle frame must not re-introduce a .distinct() exchange, and
    _spread must be a no-op when the input is already pool-wide."""
    from ocr_model_spark.operators.dedup import minhash_signatures, shingle_frame

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wide = docs.repartition(spark.sparkContext.defaultParallelism)
    # input repartition contributes 1 Exchange; shingling adds none
    assert _plan(shingle_frame(wide, "doc_id", "text")).count("Exchange") == 1
    # ... and signatures add exactly the groupBy exchange
    assert _plan(minhash_signatures(wide, "doc_id", "text")).count("Exchange") == 2


def test_lsh_plan_size_independent_of_dim(spark):
    """Hyperplanes travel as broadcast DATA, not inline literals: the plan
    string must stay O(KB) at dim=1024 (VERDICT r1 item 10)."""
    from ocr_model_spark.operators.similarity import lsh_cosine_topk

    emb = spark.range(20).select(
        F.col("id").alias("vec_id"),
        F.transform(F.sequence(F.lit(1), F.lit(1024)), lambda i: i.cast("double")).alias(
            "embedding"
        ),
    )
    q = emb.filter(F.col("vec_id") < 2)
    plan = _plan(lsh_cosine_topk(q, emb, k=3, n_planes=4, dim=1024, n_tables=8))
    assert len(plan) < 50_000, f"plan blew up: {len(plan)} chars"
    # single shuffle on the bucket key (plus the top-k window shuffle)
    assert "CrossJoin" not in plan.replace("BroadcastNestedLoopJoin", "")


def test_asof_join_plan_has_no_join_nodes(spark):
    """The as-of operator is a union + window, never an inequality join:
    no Join of any kind in the plan, exactly one window-partition Exchange
    (AQE may add a union-side exchange pair, but no SortMergeJoin)."""
    from ocr_model_spark.queries import q_asof_last_purchase

    plan = _plan(q_asof_last_purchase(spark, "/root/testdata/sf0.001"))
    for node in ("SortMergeJoin", "BroadcastHashJoin", "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, f"{node} leaked into the as-of plan"
    assert "Window" in plan


def test_bucketed_join_is_exchange_free(spark):
    """Co-located storage: joining two tables bucketed on the same key must
    not shuffle either side (the 100 TB hot-join layout)."""
    from ocr_model_spark.sources.pages import write_bucketed

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    spark.sql("DROP TABLE IF EXISTS _pq_ev_b")
    spark.sql("DROP TABLE IF EXISTS _pq_us_b")
    write_bucketed(e, "_pq_ev_b", ["user_id"], 8)
    write_bucketed(
        e.groupBy("user_id").agg(F.sum("value").alias("total")), "_pq_us_b", ["user_id"], 8
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("_pq_ev_b").join(spark.table("_pq_us_b"), "user_id")
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert j.count() == e.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS _pq_ev_b")
        spark.sql("DROP TABLE IF EXISTS _pq_us_b")


def test_doc_chunks_stays_in_codegen_with_pruned_scan(spark):
    """Chunking is pure expressions: whole-stage codegen, no Exchange, no
    Python stage, and the parquet scan reads only (doc_id, text)."""
    from ocr_model_spark.queries import q_doc_chunks

    df = q_doc_chunks(spark, "/root/testdata/sf0.001")
    plan = _formatted(df)
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # ORDER BY adds one Exchange (rangepartitioning); chunk generation
    # itself must add none
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_pii_scrub_runs_email_regex_once_per_row(spark):
    """The staged form must materialize ONE email-replaced intermediate:
    exactly one regexp_replace over the raw column with the email pattern
    appears in the optimized plan (the review found a double evaluation)."""
    from ocr_model_spark.queries import q_pii_scrub_stats

    df = q_pii_scrub_stats(spark, "/root/testdata/sf0.001")
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert optimized.count("<EMAIL>") == 1, optimized


def test_repetition_profile_two_keyed_shuffles(spark):
    """r7: the per-doc word/bigram stats are IN-ROW sorted folds (zero
    shuffles — only the cross-document duplicate-ngram coverage still
    aggregates: marks groupBy + per-doc combine, partial+final each); no
    cross join, no Python stage."""
    from ocr_model_spark.queries import q_repetition_profile

    df = q_repetition_profile(spark, "/root/testdata/sf0.001")
    plan = _formatted(df)
    assert "ArrowEvalPython" not in plan and "CartesianProduct" not in plan
    assert plan.count("HashAggregate") >= 4  # coverage partial+final pairs


def test_bm25_plan_all_broadcast_no_python(spark):
    """BM25 serving plan (in-row regime, r7): the query-term relation, idf
    table, and corpus stats all BROADCAST, no SortMergeJoin, no cartesian
    product, no Python stage — and corpus TOKENS never explode: the only
    Generate nodes are the one-per-doc inline struct and the ≤|terms|
    tf-hit explode (no full-token explode feeding a (doc, term) shuffle)."""
    from ocr_model_spark.queries import q_bm25_topk

    df = q_bm25_topk(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_bm25_postings_regime_keeps_semi_join_prune(spark):
    """Above ``max_inrow_terms`` the postings regime must engage, and its
    corpus-sized doc-length frame must stay semi-join-pruned to hit doc
    ids before the scoring join (VERDICT r5 #5 — the 10^12 shape)."""
    from ocr_model_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = [("q0", ["hash", "join"])]
    df = bm25_topk(docs, queries, k=5, max_inrow_terms=1)
    plan = _plan(df)
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan


def test_bm25_regimes_identical_output(spark):
    """The in-row and postings regimes are two physical plans for ONE
    operator contract — row-for-row identical output (scores are the same
    doubles: tf/df/dl are equal integers and the contribution/fold
    expressions are shared)."""
    from ocr_model_spark.operators.retrieval import bm25_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = [
        ("q_hash_join", ["hash", "join"]),
        ("q_vector_scan", ["vector", "column", "scan"]),
    ]
    inrow = bm25_topk(docs, queries, k=5).orderBy("query_id", "rank").collect()
    posting = (
        bm25_topk(docs, queries, k=5, max_inrow_terms=0)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert inrow == posting
    assert len(inrow) > 0


def test_semantic_dedup_plan_cell_equijoin_no_crossjoin(spark):
    """SemDeDup: the within-cell pair generation must be an EQUI-join on
    the cell id (cells bound the quadratic term) — never an all-pairs
    cartesian product; assignment is pure codegen (no Python)."""
    from ocr_model_spark.queries import q_semantic_dedup

    df = q_semantic_dedup(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_embedding_near_dups_pair_dedup_rides_spread_shuffle(spark):
    """The candidate-pair dedup must reuse the spread repartition's
    partitioning (r7): every exchange keyed on BOTH pair columns is the
    user REPARTITION_BY_COL — a second ENSURE_REQUIREMENTS exchange on
    (id_a, id_b) would mean dropDuplicates stopped riding the repartition
    and the pair frame is shuffled twice on the same key."""
    import re

    from ocr_model_spark.operators.similarity import embedding_near_dups

    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (i + F.col("id")).cast("double"),
        ).alias("embedding"),
    )
    plan = _plan(embedding_near_dups(emb, threshold=0.99, n_planes=2, dim=8, n_tables=2))
    origins = re.findall(
        r"Exchange hashpartitioning\(id_a#\d+L, id_b#\d+L, \d+\), (\w+)", plan
    )
    assert origins, f"expected a pair-key exchange in the plan:\n{plan}"
    assert all(o == "REPARTITION_BY_COL" for o in origins), origins


def test_winnow_let_binding_survives_optimizer(spark):
    """The collapse-proof let-binding (dedup._let) must survive into the
    OPTIMIZED plan: the winnow selection reads its gram-hash array through
    a single-element transform's lambda variable. Regression pin for the
    CollapseProject incident — the alias got inlined into the window
    lambda on the packaged plan shape and the chain re-ran the tokenizer
    per window start (O(n^3), 0.9 s -> >520 s on 300 docs)."""
    from ocr_model_spark.queries import q_winnow_fingerprints

    df = q_winnow_fingerprints(spark, "/root/testdata/sf0.001")
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    # the winnow outputs sit behind a Generate boundary (F.inline) ...
    gen_lines = [ln for ln in optimized.split("\n") if "Generate inline" in ln]
    assert gen_lines, optimized
    # ... and the tokenize+hash pipeline was NOT re-inlined into it: the
    # Generate's expression reads the hash array as a child-Project
    # ATTRIBUTE (array(h#N)), never recomputing the tokenizer regex
    assert "regexp_replace" not in gen_lines[0], gen_lines[0]
    assert "array(h#" in gen_lines[0], gen_lines[0]


def test_boilerplate_removal_plan_shape(spark):
    """Boilerplate removal: text cleaning happens in-row after an equi-join
    on the group key — no cartesian product, no Python stage, and the
    final outputs sit behind a Generate (single-pass split+filter)."""
    from ocr_model_spark.queries import q_boilerplate_removal

    df = q_boilerplate_removal(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate inline" in optimized, optimized


def test_registrable_domains_plan_pure_expressions(spark):
    """psl_struct is in-row only: the suffix table rides the plan as a
    literal array — no Join of any kind, no Python stage, and the
    decomposition sits behind one Generate (inline of the struct)."""
    from ocr_model_spark.queries import q_registrable_domains

    df = q_registrable_domains(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    for node in (
        "SortMergeJoin",
        "BroadcastHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
    ):
        assert node not in plan, f"{node} leaked into the PSL plan"
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate inline" in optimized, optimized


def test_estimate_jaccard_plan_prunes_sig_frame(spark):
    """The estimator touches the corpus-sized signature frame only through
    the candidate-id semi-prune (the BM25 doc-length shape): exactly four
    equi-joins in the optimized plan — the prune join materialized once
    per consumed side (2) plus the two candidate-scale signature joins.
    Without the prune the plan has two joins and ships the full frame."""
    import re

    from ocr_model_spark.queries import q_minhash_est_jaccard

    df = q_minhash_est_jaccard(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    n_joins = len(re.findall(r"\bJoin\b", optimized))
    assert n_joins == 4, f"expected the pruned 4-join shape, got {n_joins}:\n{optimized}"
