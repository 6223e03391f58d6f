"""Deduplication operators for training-data pipelines (driver-mandated
first-class components, beyond the reference's J4/U2 ensemble dedup).

All variants share a **cross-engine stable hash** so the DuckDB oracle can
verify them bit-for-bit:

    Spark : conv(substr(md5(s), 1, 8), 16, 10)            → BIGINT
    DuckDB: CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)  → BIGINT

(verified identical; never use xxhash64/hash() — engine-specific.)

Scale notes: every operator is expression-only until the final key shuffle;
shingle explosion multiplies rows ~n_words× so the shingle frame projects to
(id, shingle-hash) immediately; LSH banding turns the quadratic all-pairs
problem into a groupBy on band keys (the standard web-dedup design — one
shuffle per band set, skew-safe because hot bands are capped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# single source of truth for the minhash constants: the Spark-free kernel
# twin (kernels/minhash.py) — streaming computes signatures in-row with it,
# and a test pins kernel == expression pipeline
from ocr_model_spark.kernels.minhash import (  # noqa: F401  (re-exported)
    MERSENNE31,
    MINHASH_A,
    MINHASH_B,
    N_BANDS,
    ROWS_PER_BAND,
    SIMHASH_BITS,
)


def stable_hash(col: Column) -> Column:
    """32-bit stable hash of a string column (md5-prefix; oracle-matchable)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _let(value: Column, body) -> Column:
    """Let-binding for expensive array expressions inside higher-order
    functions: evaluate ``value`` ONCE per row and expose it to ``body`` as
    a lambda variable (a bound reference, free to read repeatedly).

    Why this exists: "project the array to a column first" is NOT a
    guarantee — Catalyst's CollapseProject can inline a multi-referenced
    alias back into the consuming expression (observed on the packaged
    spark-submit path: the winnow chain collapsed and re-ran the
    tokenize+hash pipeline per window start, turning O(n) into O(n³);
    jstack showed RegExpReplace.nullSafeEval inside the winnow stage).
    A single-element ``transform`` is collapse-proof by construction:
    the optimizer cannot substitute through a NamedLambdaVariable."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _all_pairs(items: Column) -> Column:
    """All (i < j) element pairs of a SORTED bucket array, as (a, b)
    structs — the bucket-local pair generator shared by every candidate
    operator (minhash / simhash / winnow). Pairs generate inside the row
    after one groupBy on the bucket key, so bucket size stays observable
    (for ``max_bucket`` caps) and there is never a self-join. ``items``
    must sit behind an aggregation boundary (it always does: every caller
    passes a collect_list output), which Catalyst cannot inline through."""
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(items) - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.size(items)),
                lambda j: F.struct(
                    F.element_at(items, i).alias("a"),
                    F.element_at(items, j).alias("b"),
                ),
            ),
        )
    )


def normalized_words(text: Column) -> Column:
    """Canonical tokenization shared by all text-dedup ops (and the oracle):
    lowercase, strip non-alphanumerics, split on whitespace runs."""
    cleaned = F.trim(F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " "))
    return F.filter(F.split(cleaned, r"\s+"), lambda w: w != "")


def shingles_of(words: Column, n: int = 3) -> Column:
    """Array of n-word shingles from a words-array column.

    Let-bound (see ``_let``): the per-shingle ``slice`` reads a lambda
    variable, so the input evaluates exactly once per row even when
    ``words`` is a computed expression or an alias CollapseProject inlined
    (an expression captured inside a HOF lambda otherwise re-evaluates per
    element — measured 25× on the regex tokenization, O(n³) after a
    collapse). Still project ``normalized_words`` to a column in hot paths
    that reuse the words array across several output columns."""

    def body(ws: Column) -> Column:
        return F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(ws) - n),
                lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
            ),
        ).otherwise(F.array(F.array_join(ws, " ")))

    return _let(words, body)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Array of n-word shingles (space-joined). Prefer
    ``shingles_of(materialized_words_col)`` in hot paths (see above)."""
    return shingles_of(normalized_words(text), n)


# ------------------------------------------------------------- exact dedup


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup by content hash: one row per duplicate group (size > 1)
    with the member ids and the canonical keeper (min id). sha2 over the raw
    text — the same content key the reference caches on
    (``worker/storage_manager.py:27-28``)."""
    h = F.sha2(F.col(text_col), 256).alias("content_sha256")
    return (
        df.select(F.col(id_col).alias("id"), h)
        .groupBy("content_sha256")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("id").alias("keep_id"),
            F.sort_array(F.collect_list("id")).alias("member_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


# ----------------------------------------------------- n-gram Jaccard pairs


def words_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Shared (id, w: array<string>) tokenized projection — ONE regex
    tokenization pass feeding every gram-family consumer (shingle_frame,
    repetition_profile, duplicate_ngram_coverage). When a single slot
    computes several of those aggregates, ``localCheckpoint`` the result
    so the tokenize work runs once instead of once per branch (the
    tokenize regex dominates; the checkpointed frame is narrow —
    id + words array, no payloads)."""
    # spread first: a single-file scan is one partition, which would run the
    # (CPU-bound) tokenization expressions single-threaded; hash on the id
    # (unique) so no round-robin pre-sort is paid
    spread = _spread(df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")), "id")
    return spread.select("id", normalized_words(F.col("t")).alias("w"))


def shingle_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    hashed: bool = True,
    *,
    words: DataFrame | None = None,
) -> DataFrame:
    """(id, shingle) long frame, distinct per doc; the fat text column is
    projected away before any shuffle. ``hashed=True`` replaces the shingle
    string with its 32-bit stable hash (for minhash); exact Jaccard keeps the
    strings so 32-bit collisions can't merge distinct shingles. Pass a
    pre-built ``words`` frame (``words_frame``) to share one tokenization
    pass across sibling aggregates."""
    worded = words if words is not None else words_frame(df, id_col, text_col)
    out = worded.select(
        "id",
        F.explode(F.array_distinct(shingles_of(F.col("w"), n))).alias("shingle"),
    )
    # (id, shingle) rows are already unique — the array was array_distinct'd
    # per document before explode — so no .distinct() here: it would be a
    # full exchange+agg of the entire shingle frame for nothing (measured as
    # the dominant cost of minhash_candidates). With hashed=True a 32-bit
    # collision can duplicate an (id, sh) row, but every consumer (min() in
    # minhash, band-key concat) is insensitive to duplicates.
    if hashed:
        out = out.select("id", stable_hash(F.col("shingle")).alias("sh"))
    return out


def _spread(df: DataFrame, *key: str) -> DataFrame:
    """Repartition a narrow frame to the pool width so per-row CPU work
    parallelizes even from a one-partition scan.

    Gated: at real scale the scan is already thousands of splits and this
    would be a pointless full-corpus shuffle — only repartition when the
    scan is narrower than the pool.

    Pass ``key`` column name(s) (unique or near-unique — e.g. the doc id)
    to hash-partition instead of round-robin: a keyless ``repartition(n)``
    first pays a LOCAL SORT of its input (``sortBeforeRepartition``, on by
    default since SPARK-23207 so retried tasks reproduce their row→partition
    assignment) — on a one-partition scan that sort is itself
    single-threaded dead time. Hash partitioning on a deterministic unique
    key needs no such sort (the assignment is already a pure row function)
    and spreads evenly."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() >= sc.defaultParallelism:
        return df
    if key:
        return df.repartition(sc.defaultParallelism, *[F.col(k) for k in key])
    return df.repartition(sc.defaultParallelism)


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via shingle self-join.

    Exact but quadratic in co-shingled docs — the CORRECTNESS baseline; use
    :func:`minhash_candidates` as the scale path and feed its candidates into
    this for verification of the survivors only.
    """
    sh = shingle_frame(df, id_col, text_col, n, hashed=False)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    # no broadcast hint on `sizes`: it is a full-corpus per-doc aggregate
    # (billions of rows at crawl scale) — a shuffle join is the safe shape,
    # and AQE will still pick broadcast when the frame is genuinely small
    return (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    *,
    words: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for a CANDIDATE pair list (id_a, id_b) — the
    scale-correct use of exact Jaccard: verify LSH survivors, never
    all-pairs. The candidate list (small by construction: LSH already
    pruned) is BROADCAST to prune the shingle frame before the one
    shuffled join on (id, shingle); candidate pairs sharing no shingle
    come back with jaccard 0 rather than vanishing."""
    # the pair list feeds FOUR subtrees (member pruning, two join sides,
    # the final left join) — checkpoint it so an expensive upstream
    # candidate generator (the LSH pipeline) runs once, not per subtree.
    # LAZY: eager would execute the whole LSH job at plan-construction
    # time (schema inspection / explain would pay it too)
    p = pairs.select("id_a", "id_b").localCheckpoint(eager=False)
    # prune the shingle frame to candidate MEMBERS before anything else:
    # sizes and the common-shingle join then scale with the candidate set,
    # not the corpus (the full-corpus groupBy was the scale bug here)
    member_ids = (
        p.select(F.col("id_a").alias("id"))
        .unionByName(p.select(F.col("id_b").alias("id")))
        .distinct()
    )
    # pruned + flat → cheap to materialize; three consumers (sizes, both
    # common-join sides) would otherwise re-tokenize the corpus each
    sh = (
        shingle_frame(df, id_col, text_col, n, hashed=False, words=words)
        .join(F.broadcast(member_ids), "id")
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    common = (
        sh.withColumnRenamed("id", "id_a")
        .join(F.broadcast(p), "id_a")
        .join(
            sh.select(F.col("id").alias("id_b"), "shingle"),
            ["id_b", "shingle"],
        )
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        p.join(common, ["id_a", "id_b"], "left")
        .withColumn("n_common", F.coalesce(F.col("n_common"), F.lit(0)))
        # LEFT joins + coalesce-to-0: a pair member with ZERO shingles
        # (text shorter than n words) must yield jaccard 0.0, not silently
        # vanish through an inner join (docstring contract; unreachable
        # via minhash_candidates but this is a public operator)
        .join(
            F.broadcast(sizes).withColumnsRenamed({"id": "id_a", "n_sh": "n_a"}),
            "id_a",
            "left",
        )
        .join(
            F.broadcast(sizes).withColumnsRenamed({"id": "id_b", "n_sh": "n_b"}),
            "id_b",
            "left",
        )
        .withColumn("n_a", F.coalesce(F.col("n_a"), F.lit(0)))
        .withColumn("n_b", F.coalesce(F.col("n_b"), F.lit(0)))
        .withColumn(
            "jaccard",
            F.when(
                F.col("n_a") + F.col("n_b") - F.col("n_common") > 0,
                F.round(
                    F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                    6,
                ),
            ).otherwise(F.lit(0.0)),
        )
        .select("id_a", "id_b", "n_common", "jaccard")
    )


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 3,
    min_hits: int = 2,
) -> DataFrame:
    """Benchmark decontamination signal: per document, how many of its
    distinct word n-grams appear in the BENCHMARK set (eval/test data that
    must not leak into training), plus a ``contaminated`` flag at
    ``min_hits``. The standard n-gram-overlap decontamination step (GPT-3
    appendix C / PaLM-style 13-gram checks use the same shape at larger n).

    Scale shape: the benchmark is small by definition (eval sets are
    thousands of docs, the corpus is billions), so its DISTINCT shingle set
    is built once and BROADCAST — the corpus-side shingle frame is probed
    map-side with no shuffle of corpus data; the only corpus shuffle is the
    final per-doc fold, keyed on the doc id. Left join keeps clean docs
    (hits = 0)."""
    doc_sh = shingle_frame(docs, id_col, text_col, n, hashed=False)
    bench_sh = (
        shingle_frame(benchmark, bench_id_col, bench_text_col, n, hashed=False)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long")
            .alias("n_bench_hits"),
            F.count("*").alias("n_ngrams"),
        )
        .select(
            id_col,
            "n_bench_hits",
            "n_ngrams",  # denominator for a contamination fraction
            (F.col("n_bench_hits") >= min_hits).alias("contaminated"),
        )
    )


def duplicate_ngram_coverage(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    *,
    words: DataFrame | None = None,
) -> DataFrame:
    """Cross-document duplicate n-gram coverage — the exact-substring
    dedup signal training pipelines compute corpus-wide (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): per
    document, how many of its distinct word n-grams appear in at least one
    OTHER document, and the shared fraction. High coverage = boilerplate /
    template / copied content even when no single pair crosses a
    near-dup threshold.

    Plan shape: reuses the distinct (id, shingle) frame, marks each
    shingle shared iff min(id) != max(id) — one COMBINING groupBy on the
    shingle key (min/max partials, no count-distinct) — then joins the
    flags back (co-partitioned on the shingle key from the same shuffle)
    and folds per doc. Boilerplate-hot shingles skew the join-back; AQE's
    skew-join split handles it (the marks side is one row per shingle).
    At 10^12 rows run the same plan over ``hashed=True`` shingles: 64-bit
    collisions can only overcount sharing by ~n_shingles/2^64."""
    sh = shingle_frame(df, id_col, text_col, n, hashed=False, words=words)
    marks = sh.groupBy("shingle").agg(
        F.min("id").alias("mn"), F.max("id").alias("mx")
    )
    return (
        sh.join(marks, "shingle")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum((F.col("mn") != F.col("mx")).cast("long")).alias(
                "n_shared_ngrams"
            ),
        )
        .withColumn(
            "shared_ngram_frac",
            F.round(F.col("n_shared_ngrams") / F.col("n_ngrams") + 1e-9, 4),
        )
    )


def paragraph_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style paragraph-granularity dedup signal (Wenzek et al. 2020,
    "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
    Data" — CCNet deduplicates at the paragraph/line level of the WET
    text): split each document on newlines, normalize (lowercase,
    whitespace-squeezed, trimmed), and mark a paragraph SHARED iff it
    occurs in at least one other document. Per doc: paragraph count,
    shared count, shared fraction — the signal CCNet thresholds to strip
    boilerplate lines before LM filtering.

    Same scale shape as ``duplicate_ngram_coverage``: distinct (id, para)
    frame → one combining min/max groupBy on the paragraph key (no
    count-distinct) → co-partitioned join-back → per-doc fold. Raw
    normalized strings key the shuffle (exact; no hash-collision caveat);
    at 10^12 rows swap the key for ``stable_hash(para)`` and accept the
    ~n/2^32 overcount like the hashed shingle path."""
    spread = _spread(
        df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("id"), F.col(text_col).alias("t")
        ),
        "id",
    )
    norm = lambda p: F.trim(F.regexp_replace(F.lower(p), r"\s+", " "))  # noqa: E731
    paras = spread.select(
        "id",
        F.explode(
            F.array_distinct(
                F.filter(F.transform(F.split("t", "\n"), norm), lambda p: p != "")
            )
        ).alias("para"),
    )
    marks = paras.groupBy("para").agg(
        F.min("id").alias("mn"), F.max("id").alias("mx")
    )
    return (
        paras.join(marks, "para")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count("*").alias("n_paragraphs"),
            F.sum((F.col("mn") != F.col("mx")).cast("long")).alias(
                "n_shared_paragraphs"
            ),
        )
        .withColumn(
            "shared_paragraph_frac",
            F.round(
                F.col("n_shared_paragraphs") / F.col("n_paragraphs") + 1e-9, 4
            ),
        )
    )


def _norm_line(p: Column) -> Column:
    """Line normalization shared by paragraph_dedup / boilerplate removal
    (and their oracles): lowercase, whitespace-squeezed, trimmed."""
    return F.trim(F.regexp_replace(F.lower(p), r"\s+", " "))


def boilerplate_line_removal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
    min_docs: int = 2,
    min_frac: float = 0.5,
) -> DataFrame:
    """Frequency-based boilerplate line REMOVAL, scoped per group (host /
    source): a line whose normalized form occurs in >= ``min_docs`` AND
    >= ``min_frac`` of the group's documents is chrome (nav, footer,
    cookie banner) and is dropped; everything else — including original
    spelling, ordering, and blank lines — survives byte-exact. The
    frequency-scoped variant of what CCNet's paragraph dedup and
    trafilatura's duplicate-element detection do to crawl text; the
    reference has no equivalent (driver-brief training-pipeline tier).

    Scale shape (the part that matters at 10^12 docs): the heavy text
    NEVER shuffles. Frequencies come from an exploded (id, group, norm)
    distinct frame — one shuffle of short normalized lines; group doc
    totals are a combining count; the boilerplate SET collapses to one
    bounded array per group (per doc each norm counts once, so at most
    ~lines_per_doc / min_frac norms can clear the threshold) and joins
    back to the docs frame on the group key — broadcastable for
    source-scoped runs, an ordinary co-partitioned join for 10^8-host
    runs (AQE decides). The final filter is an in-row HOF over
    split(text): cleaned text is produced on the documents' own scan
    partitions."""
    docs = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        F.col(text_col).alias("t"),
    )
    spread = _spread(docs, "id")
    norms = spread.select(
        "id",
        "grp",
        F.explode(
            F.array_distinct(
                F.filter(F.transform(F.split("t", "\n"), _norm_line), lambda p: p != "")
            )
        ).alias("norm"),
    )
    freq = norms.groupBy("grp", "norm").agg(F.count("*").alias("n"))
    totals = docs.groupBy("grp").agg(F.count("*").alias("d"))
    boiler = (
        freq.join(totals, "grp")
        .filter((F.col("n") >= min_docs) & (F.col("n") / F.col("d") >= min_frac))
        .groupBy("grp")
        .agg(F.sort_array(F.collect_list("norm")).alias("bl"))
    )
    is_boiler = lambda ln: F.coalesce(  # noqa: E731
        F.array_contains(F.col("bl"), _norm_line(ln)), F.lit(False)
    )

    # nested let-bindings: split once, filter once, derive all four outputs
    # from the bound arrays (collapse-proof and single-pass; see _let)
    def outputs(lines: Column) -> Column:
        def from_kept(kept: Column) -> Column:
            n, k = F.size(lines), F.size(kept)
            return F.struct(
                n.alias("n_lines"),
                (n - k).alias("n_removed"),
                F.round(
                    F.when(n > 0, (n - k) / n).otherwise(F.lit(0.0)) + 1e-9, 4
                ).alias("removed_frac"),
                F.array_join(kept, "\n").alias("cleaned_text"),
            )

        return _let(F.filter(lines, lambda ln: ~is_boiler(ln)), from_kept)

    # F.inline puts a Generate boundary under the struct: split + filter
    # run exactly once per row regardless of how CollapseProject treats
    # the four field references
    return docs.join(boiler, "grp", "left").select(
        F.col("id").alias(id_col),
        F.inline(F.array(_let(F.split(F.col("t"), "\n"), outputs))),
    )


def remove_duplicate_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    *,
    words: DataFrame | None = None,
) -> DataFrame:
    """Exact-substring duplicate-span REMOVAL (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" §3.1
    ExactSubstr) — the transform, not just the coverage measurement
    (``duplicate_ngram_coverage``): emit a ``cleaned_text`` column with
    every token covered by a cross-document duplicated n-gram removed.
    The paper trims ≥50-token spans found via a suffix array; the
    distributed re-expression marks every n-token window whose exact
    word n-gram occurs in more than one document and drops the covered
    token positions — any shared span of length L ≥ n is covered wall-
    to-wall by its L−n+1 constituent n-grams, so the kept text is
    identical to the paper's span-trim for spans ≥ n.

    Spec (deterministic, oracle-matchable): tokens = ``normalized_words``
    (the canonical dedup tokenization); an n-gram occurrence at 0-based
    start p covers positions p..p+n-1; an n-gram is duplicated iff it
    appears in ≥2 distinct docs (min≠max over the occurrence frame — the
    combining-groupBy shape, no count-distinct); ``cleaned_text`` =
    surviving tokens in order, space-joined. Docs shorter than n tokens
    have no n-grams and survive whole.

    Scale shape: the only corpus-wide shuffles are the n-gram min/max
    groupBy and the occurrence join-back (both keyed on the n-gram; AQE
    skew-split handles boilerplate-hot grams — marks is one row per
    gram). Covered positions fold to one sorted per-doc array, and the
    reassembly filter runs where each doc's words already sit — token
    rows never shuffle. At 10^12 docs key the shuffles on
    ``stable_hash`` grams (64-bit collision ⇒ ~n/2^64 overdeletion)."""
    worded = words if words is not None else words_frame(df, id_col, text_col)
    # TOTAL output: null-text docs tokenize to a null words array — coalesce
    # to empty so they survive whole (n_tokens=0, cleaned_text='') instead of
    # vanishing from the corpus (review finding r6: a filter here silently
    # dropped their ids from the cleaned frame).
    worded = worded.withColumn(
        "w", F.coalesce("w", F.array().cast("array<string>"))
    )
    # every occurrence with its start position (posexplode index == start:
    # shingles_of emits one gram per start 0..size-n). No array_distinct —
    # repeated grams at different positions are distinct occurrences.
    occ = worded.filter(F.size("w") >= n).select(
        "id", F.posexplode(shingles_of(F.col("w"), n)).alias("pos", "g")
    )
    marks = occ.groupBy("g").agg(F.min("id").alias("mn"), F.max("id").alias("mx"))
    covered = (
        occ.join(marks.filter(F.col("mn") != F.col("mx")).select("g"), "g")
        .select("id", F.explode(F.sequence("pos", F.col("pos") + (n - 1))).alias("tok"))
        .groupBy("id")
        .agg(F.sort_array(F.collect_set("tok")).alias("removed"))
    )
    kept = F.filter(
        F.col("w"), lambda x, i: ~F.array_contains(F.col("removed"), i)
    )
    return (
        worded.join(covered, "id", "left")
        .withColumn("removed", F.coalesce("removed", F.array().cast("array<int>")))
        .select(
            F.col("id").alias(id_col),
            F.size("w").alias("n_tokens"),
            F.size("removed").alias("n_removed"),
            F.round(
                F.when(F.size("w") > 0, F.size("removed") / F.size("w"))
                .otherwise(F.lit(0.0)) + 1e-9,
                4,
            ).alias("removed_frac"),
            F.array_join(kept, " ").alias("cleaned_text"),
        )
    )


def keep_best_per_cluster(
    scored: DataFrame,
    clusters: DataFrame,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Near-dup RETENTION policy: one representative per duplicate cluster.
    Measuring clusters is not a pipeline decision — this operator makes it:
    the highest-``score_col`` member of each cluster is kept (min-id
    tiebreak, so the choice is total and deterministic), everything else
    drops. Docs absent from ``clusters`` (never a candidate pair) form
    singleton clusters and keep themselves.

    Inputs: ``scored`` = (id_col, score_col) over the full corpus;
    ``clusters`` = (id, label) from either connected-components variant.
    Output: (id_col, cluster_id, score_col, kept).

    Scale shape: one left join on id (clusters is the small side — only
    docs that had a candidate pair) + one window keyed on cluster_id.
    Cluster sizes are near-dup groups (bounded in practice; AQE skew-join
    covers pathological boilerplate clusters), so the rank window never
    sees a corpus-sized partition."""
    asg = (
        scored.select(F.col(id_col).alias("id"), F.col(score_col))
        .join(clusters.select("id", "label"), "id", "left")
        .withColumn("cluster_id", F.coalesce("label", F.col("id")))
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(score_col).desc(), F.col("id").asc()
    )
    return asg.select(
        F.col("id").alias(id_col),
        "cluster_id",
        score_col,
        (F.row_number().over(w) == 1).alias("kept"),
    )


# ------------------------------------------------------------- MinHash LSH


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    *,
    words: DataFrame | None = None,
) -> DataFrame:
    """16 minhash values per doc: min over shingles of (a_i*sid + b_i) mod P.
    One narrow groupBy over the shingle frame — 16 mins computed in a single
    partial-aggregating pass (map-side combine). Pass a pre-built ``words``
    frame to share one tokenization pass with sibling consumers."""
    sh = shingle_frame(df, id_col, text_col, n, words=words).withColumn(
        "sid", F.pmod(F.col("sh"), F.lit(MERSENNE31))
    )
    aggs = [
        F.min(F.pmod(F.lit(a) * F.col("sid") + F.lit(b), F.lit(MERSENNE31))).alias(f"mh{i}")
        for i, (a, b) in enumerate(zip(MINHASH_A, MINHASH_B))
    ]
    return sh.groupBy("id").agg(*aggs)


def _band_structs() -> list[Column]:
    """The LSH band keys as (band, band_key) structs over a signature
    frame's mh0..mhN columns — shared by the within-corpus and the
    cross-corpus candidate generators."""
    out = []
    for b in range(N_BANDS):
        cols = [
            F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
            for r in range(ROWS_PER_BAND)
        ]
        out.append(
            F.struct(F.lit(b).alias("band"), F.concat_ws("_", *cols).alias("band_key"))
        )
    return out


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_bucket: int | None = None,
    sigs: DataFrame | None = None,
    words: DataFrame | None = None,
) -> DataFrame:
    """LSH banding: docs sharing any (band_idx, band_key) bucket become a
    candidate pair. Returns distinct (id_a < id_b) pairs.

    Plan shape (the one that survives 10^12 rows): the signature frame is
    computed ONCE, bands explode from an array literal (no N re-computations
    of the upstream pipeline), and pairs are generated per-bucket with
    higher-order functions after a single groupBy on the band key — one
    shuffle total, no self-join.

    ``max_bucket`` caps pathological buckets (boilerplate-identical docs):
    pair count is quadratic per bucket, so at web scale run exact dedup
    first and cap here (the dropped buckets are already exact-dup groups).
    Default None = emit everything (exact LSH semantics; matches the SQL
    oracle).

    ``sigs``: pass a precomputed :func:`minhash_signatures` frame to share
    the tokenize+shingle+min pass with other consumers (the estimator,
    the verifier); ``words``: share just the tokenization (the
    ``repetition_profile`` pattern) when the sibling needs raw shingles
    rather than signatures."""
    sig = (
        sigs
        if sigs is not None
        else minhash_signatures(df, id_col, text_col, n, words=words)
    )
    banded = sig.select("id", F.explode(F.array(*_band_structs())).alias("bk")).select(
        "id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    return (
        buckets.select(F.explode(_all_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .distinct()
    )


def exact_dup_rank(
    df: DataFrame, id_col: str, sha_col: str = "content_sha256"
) -> DataFrame:
    """Deterministic exact-dedup ranking: ``exact_rank`` numbers the rows
    of each content-hash group by the md5-prefix stable hash of the id
    (ties by id — never rand()), so rank 1 is the keeper and rank > 1 the
    exact duplicates. Shared by the batch corpus builder (which tags the
    losers in its funnel) and the streaming incremental builder (which
    filters to keepers) — one definition so the keeper rule cannot drift
    between them. Identical (id, sha) replays keep the same rows."""
    w = Window.partitionBy(sha_col).orderBy(
        stable_hash(F.col(id_col)), F.col(id_col)
    )
    return df.withColumn("exact_rank", F.row_number().over(w))


def estimate_jaccard(pairs: DataFrame, sigs: DataFrame) -> DataFrame:
    """Signature-agreement Jaccard estimate per candidate pair — the free
    ranking/gating step a real pipeline runs BETWEEN LSH banding and exact
    shingle verification: each of the 16 minhash components of two docs
    agrees with probability equal to their true Jaccard, so the agreement
    fraction is an unbiased estimate that costs two narrow joins (the
    signatures already exist) instead of a shingle re-walk. Returns
    ``(id_a, id_b, n_agree, est_jaccard)``; the estimate rounds 4 dp with
    the +1e-9 nudge so both engines agree at gate thresholds.

    Scale shape: the corpus-sized signature frame is semi-join-pruned to
    candidate ids FIRST (the BM25 doc-length lesson — at 10^12 docs the
    full frame can neither broadcast nor shuffle wide); both remaining
    joins are candidate-scale."""
    n = len(MINHASH_A)
    ids = (
        pairs.select(F.col("id_a").alias("id"))
        .union(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    pruned = sigs.join(ids, "id")
    sa = pruned.select(
        F.col("id").alias("id_a"), *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(n)]
    )
    sb = pruned.select(
        F.col("id").alias("id_b"), *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(n)]
    )
    joined = pairs.join(sa, "id_a").join(sb, "id_b")
    n_agree = sum(
        (F.col(f"_a{i}") == F.col(f"_b{i}")).cast("int") for i in range(n)
    )
    return joined.select(
        "id_a",
        "id_b",
        n_agree.alias("n_agree"),
        F.round(n_agree / F.lit(float(n)) + 1e-9, 4).alias("est_jaccard"),
    )


# -------------------------------------------------------------- Winnowing


def gram_hashes(words: Column, k: int = 3) -> Column:
    """Stable 32-bit hashes of the k-word shingles of a words-array column.
    ``shingles_of`` is let-bound internally, and the shingle array is this
    transform's collection argument (evaluated once) — collapse-safe."""
    return F.transform(shingles_of(words, k), stable_hash)


def winnow_select(hashes: Column, w: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS local-fingerprint algorithm; no reference equivalent, this is
    a driver-brief dedup-family operator): slide a window of ``w``
    consecutive gram hashes and keep each window's minimum; the sorted
    distinct selected values are the document's fingerprint set.

    Guarantee: any shared run of k + w - 1 words between two documents
    yields at least one shared fingerprint, so fingerprints are a
    position-robust LOCAL similarity key (MinHash is global — a long doc
    quoting a short one dilutes Jaccard below any LSH threshold, but its
    winnow fingerprints still collide). Expected density is 2/(w+1).

    The paper breaks value ties by taking the RIGHTMOST minimal hash to
    minimize density; since only hash VALUES are returned (not positions),
    the selected set is identical under any tie rule — which is what makes
    the operator expression-only on both engines. When there are fewer
    than ``w`` hashes the single clamped window covers the whole list (the
    paper's degenerate case).

    Let-bound (see ``_let``): the window reads are bound-reference lookups
    even when ``hashes`` is a computed expression or an alias that
    CollapseProject inlined — the selection stays O(n·w) under any plan
    shape."""

    def body(h: Column) -> Column:
        starts = F.sequence(F.lit(0), F.greatest(F.size(h) - w, F.lit(0)))
        mins = F.transform(starts, lambda i: F.array_min(F.slice(h, i + 1, w)))
        return F.array_sort(F.array_distinct(mins))

    return _let(hashes, body)


def winnow_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    w: int = 4,
    min_common: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate pairs sharing >= ``min_common`` winnow fingerprints, with
    the shared-fingerprint count per pair.

    Plan shape at 10^12 docs: fingerprints explode ~2/(w+1) × n_grams rows
    per doc (each only (id, fp) — the text never shuffles), then ONE
    groupBy on the fingerprint value with per-bucket higher-order pair
    generation (the ``minhash_candidates`` pattern — no self-join), then a
    combining count groupBy on the pair key. ``max_bucket`` caps
    boilerplate-hot fingerprints exactly like the LSH band cap."""
    words = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"), normalized_words(F.col(text_col)).alias("w")
    )
    hashed = words.select("id", gram_hashes(F.col("w"), k).alias("h"))
    fps = hashed.select("id", F.explode(winnow_select(F.col("h"), w)).alias("fp"))
    buckets = (
        fps.groupBy("fp")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .filter(F.size("ids") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    return (
        buckets.select(F.explode(_all_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


# ------------------------------------------------- incremental (cross) dedup


def cross_corpus_candidates(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidate pairs ACROSS two frames only — the incremental-crawl
    shape: dedupe a NEW batch against the STANDING corpus without paying
    for batch×batch or corpus×corpus pairs. Returns distinct
    (batch_id, corpus_id).

    Plan at 10^12 corpus docs: signatures are 17 narrow longs per doc (text
    never shuffles) — in production the corpus side is computed once and
    persisted as the dedup index, so each crawl increment only signatures
    the batch. One groupBy on the band key with SIDE-SPLIT id lists
    (collect_list skips the other side's nulls), cross pairs generated
    in-row; ``max_bucket`` caps len(batch)×len(corpus) per bucket."""
    sb = minhash_signatures(batch, id_col, text_col, n).withColumn(
        "side", F.lit("b")
    )
    sc = minhash_signatures(corpus, id_col, text_col, n).withColumn(
        "side", F.lit("c")
    )
    banded = (
        sb.unionByName(sc)
        .select("id", "side", F.explode(F.array(*_band_structs())).alias("bk"))
        .select("id", "side", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key"))
    )
    buckets = (
        banded.groupBy("band", "band_key")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("side") == "b", F.col("id")))
            ).alias("bids"),
            F.sort_array(
                F.collect_list(F.when(F.col("side") == "c", F.col("id")))
            ).alias("cids"),
        )
        .filter((F.size("bids") > 0) & (F.size("cids") > 0))
    )
    if max_bucket is not None:
        # cast before multiplying: two int32 sizes overflow exactly on the
        # degenerate mega-bucket this cap exists to skip (ANSI mode would
        # throw; non-ANSI would wrap negative and BYPASS the cap)
        buckets = buckets.filter(
            F.size("bids").cast("long") * F.size("cids") <= max_bucket
        )
    pairs = F.flatten(
        F.transform(
            F.col("bids"),
            lambda b: F.transform(
                F.col("cids"),
                lambda c: F.struct(b.alias("batch_id"), c.alias("corpus_id")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select(F.col("p.batch_id").alias("batch_id"), F.col("p.corpus_id").alias("corpus_id"))
        .distinct()
    )


def dedup_new_against(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Batch rows that share no LSH bucket with any corpus document — the
    survivors an incremental pipeline appends to the corpus (left_anti on
    the candidate batch ids). When the LSH false-positive rate matters,
    the recovery pass runs on the DROPPED side, not the survivors:
    exact-verify the ``cross_corpus_candidates`` pairs (jaccard on the
    shingle sets) and re-admit batch ids whose every candidate pair falls
    below the similarity threshold — survivors share no bucket by
    construction, so verifying them finds nothing."""
    hit = (
        cross_corpus_candidates(batch, corpus, id_col, text_col, n, max_bucket)
        .select(F.col("batch_id").alias(id_col))
        .distinct()
    )
    return batch.join(hit, id_col, "left_anti")


def dedup_new_against_verified(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.7,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental dedup WITH the false-positive recovery pass: LSH
    candidates (cross-side only) are exact-Jaccard verified, and a batch
    document drops only when SOME corpus pair clears ``threshold`` —
    batch ids whose every candidate pair was a bucket-collision false
    positive are re-admitted. Ids must be unique ACROSS both frames (they
    key the shared shingle frame).

    Scale: verification touches only candidate MEMBERS (jaccard_verify
    broadcast-prunes the shingle frame), so the extra cost scales with
    the candidate set, not the corpus."""
    pairs = cross_corpus_candidates(
        batch, corpus, id_col, text_col, n, max_bucket
    ).select(F.col("batch_id").alias("id_a"), F.col("corpus_id").alias("id_b"))
    both = batch.select(F.col(id_col), F.col(text_col)).unionByName(
        corpus.select(F.col(id_col), F.col(text_col))
    )
    dup_ids = (
        jaccard_verify(pairs, both, id_col, text_col, n)
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return batch.join(dup_ids, id_col, "left_anti")


# ----------------------------------------------------------------- SimHash


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash fingerprint: per word, hash → per bit ±count accumulation →
    bit set where the sum is positive.

    Computed ENTIRELY in-row (r7 — zero shuffles; the r6 shape ran two
    keyed shuffles: (id, word) counts, then per-doc bit sums). The key
    identity: the per-distinct-word ±count sum equals a ±1 sum over the
    RAW token stream — every occurrence of word w contributes exactly 1
    to cnt(w), so Σ_distinct ±cnt(w) ≡ Σ_tokens ±1 — and integer sums are
    order-insensitive, making the in-row fold bit-identical to the
    groupBy. One fold over the words array with a ``bits``-long
    accumulator; the word hash is let-bound so md5 runs once per token."""
    masks = F.array(*[F.lit(1 << b).cast("long") for b in range(bits)])

    def body(ws: Column) -> Column:
        sums = F.aggregate(
            ws,
            F.array_repeat(F.lit(0).cast("long"), bits),
            lambda acc, x: _let(
                stable_hash(x),
                lambda h: F.zip_with(
                    acc,
                    masks,
                    lambda s, m: s
                    + F.when(h.bitwiseAND(m) != 0, F.lit(1).cast("long")).otherwise(
                        F.lit(-1).cast("long")
                    ),
                ),
            ),
        )
        return _let(
            sums,
            lambda ss: F.aggregate(
                F.zip_with(
                    ss,
                    masks,
                    lambda s, m: F.when(s > 0, m).otherwise(F.lit(0).cast("long")),
                ),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            ),
        )

    base = _spread(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")), "id"
    ).select("id", normalized_words(F.col("t")).alias("w"))
    # row-presence contract matches the aggregate path: docs with NULL
    # text or zero tokens produced no (id, word) rows, hence no output row
    return base.filter(F.col("w").isNotNull() & (F.size("w") > 0)).select(
        "id", _let(F.col("w"), body).alias("simhash")
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Near-dup pairs → clusters: (id, cluster_id) for every vertex, where
    cluster_id = the MIN id in the connected component. The step real dedup
    pipelines need between pair generation and "keep one per cluster".

    Min-label propagation: each iteration joins the narrow (id, label)
    frame with the symmetrized edge list and takes the min over neighbors;
    converges in O(component diameter) rounds — near-dup clusters are
    shallow (dup chains, not paths), so a handful of rounds closes them.
    TWO propagation steps run between checkpoints (r7): each checkpoint +
    convergence check is a full driver-side action, so fusing a pair of
    steps halves the job count; the fixpoint is stable under the update
    rule (applying it at convergence is the identity), so at worst one
    extra — label-identical — fused round runs, and the returned labels
    are unchanged. The plan stays O(1) deep via the per-fused-round
    ``localCheckpoint``; the convergence check is an aggregate on the
    checkpointed frame (no recomputation). Deterministic: integer mins
    only. At 10^12-edge scale (or high-diameter components) use
    ``connected_components_star`` — identical output contract, O(log n)
    rounds regardless of diameter."""
    sym = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")).unionByName(
        pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)

    def step(lbl: DataFrame) -> DataFrame:
        nbr = (
            sym.join(lbl.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        return lbl.join(nbr, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                "label"
            ),
        )

    for _ in range((max_iter + 1) // 2):
        stepped = (
            step(step(labels))
            .join(labels.withColumnsRenamed({"label": "_prev"}), "id")
            .select("id", "label", (F.col("label") < F.col("_prev")).alias("_changed"))
            .localCheckpoint(eager=True)
        )
        changed = stepped.filter("_changed").limit(1).count()
        labels = stepped.drop("_changed")
        if changed == 0:
            return labels
    # non-convergence must be LOUD: silently returning partial labels would
    # diverge from the exact transitive closure (and any oracle) with no
    # signal — raise so the caller widens max_iter or switches algorithms
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} iterations "
        "(component diameter exceeds max_iter)"
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """Large-star/small-star connected components (the CC-MR / Kiveris et
    al. 2014 alternating algorithm) — same contract as
    ``connected_components``: (id, cluster_id=min id of the component) for
    every vertex of ``pairs``.

    Why a second variant: min-label propagation converges in O(diameter)
    rounds — fine for shallow near-dup clusters, hopeless for path-shaped
    components (a 60-node chain needs 59 rounds). Star contraction
    converges in O(log n) rounds REGARDLESS of diameter and each round
    touches only the current edge set (shrinking fast), which is the
    10^12-edge swap the ``connected_components`` docstring promises:

      large-star: per node u (over symmetric neighbors), every LARGER
                  neighbor re-points to m = min(N(u) ∪ {u});
      small-star: per node u (over smaller-oriented edges), u and every
                  smaller neighbor re-point to the minimum.

    Both steps preserve connectivity and only ever link toward smaller
    ids; the fixpoint is a forest of stars rooted at component minima.
    Convergence check is EXACT (one symmetric-difference job per round —
    both frames are distinct, so a union→count-per-edge pass finds any
    edge present on only one side; no fingerprints); non-convergence
    raises loudly, mirroring the sibling. Deterministic: integer mins
    only; per-round ``localCheckpoint`` keeps the plan O(1)-deep."""
    e = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        pairs.select(F.col(id_a).alias("id"))
        .unionByName(pairs.select(F.col(id_b).alias("id")))
        .distinct()
    )

    def ls_ss_round(edges: DataFrame) -> DataFrame:
        # -- large-star over the symmetric neighbor relation
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        # no .distinct() here (r7): every consumer below is duplicate-
        # insensitive — mins2 is a combining groupBy and the round's final
        # .distinct() dedupes the joined rows — so the extra exchange
        # bought nothing (one full shuffle per round removed)
        ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # -- small-star over larger→smaller oriented edges
        e2 = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v"))
        mins2 = e2.groupBy("u").agg(F.min("v").alias("m"))
        return (
            e2.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(mins2.select("u", F.col("m").alias("v")))
            .distinct()
        )

    # one alternation round per checkpoint: fusing two rounds was tried
    # (r7) and measured SLOWER — the doubled in-job DAG (≈12 chained
    # exchanges) costs more in AQE stage materialization than the saved
    # checkpoint/convergence actions, unlike the cheap min-label step
    for _ in range(max_iter):
        ss = ls_ss_round(e).localCheckpoint(eager=True)
        changed = (
            ss.unionByName(e)
            .groupBy("u", "v")
            .count()
            .filter(F.col("count") == 1)  # edge on exactly one side
            .limit(1)
            .count()
        )
        e = ss
        if changed == 0:
            star = e  # fixpoint: (child, root) star edges
            labels = star.select(F.col("u").alias("id"), F.col("v").alias("label"))
            return (
                nodes.join(labels, "id", "left")
                # roots (and self-loop-only vertices) label themselves
                .select("id", F.coalesce("label", F.col("id")).alias("label"))
            )
    raise RuntimeError(
        f"connected_components_star did not converge in {max_iter} rounds"
    )


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """SimHash near-dup candidate pairs via bit-band blocking (Charikar):
    pairs sharing ANY of ``bands`` equal-width bands of the signature,
    kept when hamming distance <= ``max_hamming``.

    Pigeonhole EXACTNESS: <= bands-1 differing bits guarantee one intact
    band, so with bands=4, max_hamming=3 the blocking misses nothing —
    unlike MinHash banding this candidate set is not probabilistic.

    Plan shape (VERDICT r3 item 3 — the previous band SELF-JOIN generated
    |bucket|² rows per 16-bit band key with no control): one shuffle on the
    (band, bits) key into collect_list buckets — same as
    ``minhash_candidates`` — so the bucket SIZE is observable and pairs
    generate bucket-locally via higher-order functions. ``max_bucket`` caps
    pathological buckets (template-identical corpora concentrate on few
    band keys; pair count is quadratic per bucket): at web scale run exact
    dedup FIRST and cap here — a bucket overflowing the cap is dominated by
    exact/near-exact duplicates that exact dedup already collapsed. Default
    None = emit everything (exact pigeonhole semantics; matches the SQL
    oracle). Both signatures ride inside the bucket struct, so hamming is
    computed in the same HOF pass — no join back to the signature frame."""
    if max_hamming > bands - 1:
        raise ValueError("bit-band blocking is exact only for max_hamming <= bands-1")
    bits_per = SIMHASH_BITS // bands
    mask = (1 << bits_per) - 1
    sigs = simhash(df, id_col, text_col)
    banded = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"shiftright(simhash, {b * bits_per}) & {mask}").alias(
                            "key"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    )
    buckets = (
        banded.groupBy("bk")
        .agg(F.sort_array(F.collect_list(F.struct("id", "simhash"))).alias("ms"))
        .filter(F.size("ms") > 1)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ms") <= max_bucket)
    return (
        buckets.select(F.explode(_all_pairs(F.col("ms"))).alias("p"))
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.bit_count(F.col("p.a.simhash").bitwiseXOR(F.col("p.b.simhash")))
            .cast("int")
            .alias("hamming"),
        )
        # duplicate input ids sort adjacent and would emit a self-pair —
        # the strict ordering also matches the SQL oracle's a.id < b.id
        .filter((F.col("hamming") <= max_hamming) & (F.col("id_a") < F.col("id_b")))
        .distinct()
    )
