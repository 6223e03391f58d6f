"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting (driver-mandated training-data components).

All pure column expressions (regexp + arithmetic), so they run inside
whole-stage codegen at full scan speed, and every one has an exact ANSI-SQL
twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from ocr_model_spark.operators.dedup import _let, normalized_words, stable_hash

# tiny deterministic stopword sets per language (n-gram-free heuristic:
# function-word hit rate decides; ties break by the fixed language order)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "zu"],
    "fr": ["le", "la", "et", "les", "des", "est", "une", "dans"],
    # round 4: broader coverage (accent-free function words so the \b
    # word-boundary semantics stay identical across regex engines)
    "es": ["el", "los", "las", "por", "para", "como", "pero", "esta"],
    "it": ["il", "gli", "che", "della", "sono", "anche", "nel", "alla"],
    "pt": ["os", "das", "dos", "uma", "mais", "quando", "isso", "ele"],
    # round 5: nl/sv/pl from the same accent-free-marker recipe (markers
    # chosen to avoid pan-Romance collisions: no nl 'de'/'van'-as-'des',
    # no sv 'en' — those words inflate the wrong language's count)
    "nl": ["het", "een", "niet", "voor", "maar", "zijn", "ook", "naar"],
    "sv": ["och", "att", "det", "som", "inte", "har", "den", "ett"],
    "pl": ["jest", "nie", "oraz", "jako", "przez", "tylko", "jednak", "czy"],
}
# fixed priority = tie order (earlier wins ties); both engines share it
LANG_PRIORITY = ("en", "de", "fr", "es", "it", "pt", "nl", "sv", "pl")

# round 6: CJK script-range detection runs AHEAD of the Latin marker vote
# (the synth corpus has carried correctly-extracted CJK text since v14 that
# the marker vote could only label 'und'). Each entry maps a language to
# the regex character class of its DECIDING script block — literal BMP
# codepoints, so the same table generates identical Java-regex and RE2
# expressions. Priority kana > hangul > han: Japanese mixes kanji WITH
# kana and Korean hangul with rare hanja, while Chinese text carries Han
# only — so the uniquely-Japanese / uniquely-Korean scripts outrank the
# shared Han block.
CJK_SCRIPTS = {
    "ja": "぀-ヿ",  # Hiragana + Katakana (contiguous BMP blocks)
    "ko": "가-힯",  # Hangul syllables
    "zh": "一-鿿",  # CJK Unified Ideographs (main block)
}
CJK_PRIORITY = ("ja", "ko", "zh")
# the combined class, used by multilingual_token_count AND rendered into
# the DuckDB oracles (queries._cjk_class) — one definition point
CJK_ALL_CLASS = "".join(CJK_SCRIPTS[k] for k in CJK_PRIORITY)
# one stray CJK codepoint inside Latin text must not flip the vote
CJK_MIN_CHARS = 2
_EN_STOPWORDS = LANG_MARKERS["en"] + ["for", "on", "with", "as", "this", "that"]

FINGERPRINT_MOD = 2147483647

# C4 line rule (Raffel et al. 2020 §2.2): keep lines that end in terminal
# punctuation AND have ≥ 5 words; page-level flags for the template/code
# markers C4 drops pages on
_C4_TERMINAL = (".", "!", "?", '"')


def _c4_stats_from(text: Column, nonempty: Column) -> dict[str, Column]:
    """C4 stat columns given the trimmed non-empty lines array (either an
    inline expression or a let-bound lambda variable)."""
    kept = F.filter(
        nonempty,
        lambda ln: (
            F.size(F.split(ln, r"\s+")) >= 5
        )
        & F.substring(ln, -1, 1).isin(*_C4_TERMINAL),
    )
    low = F.lower(text)
    has_lorem = low.contains("lorem ipsum")
    has_brace = text.contains("{")
    n_js = F.size(
        F.filter(nonempty, lambda ln: F.lower(ln).contains("javascript"))
    )
    n_kept = F.size(kept)
    return {
        "n_lines": F.size(nonempty),
        "n_kept_lines": n_kept,
        "kept_line_frac": F.when(
            F.size(nonempty) > 0,
            F.round(n_kept / F.size(nonempty) + 1e-9, 4),
        ).otherwise(0.0),
        "has_lorem_ipsum": has_lorem,
        "has_brace": has_brace,
        "n_js_lines": n_js,
        "c4_keep": (n_kept >= 3) & ~has_lorem & ~has_brace,
    }


def _nonempty_lines(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "",
    )


def c4_line_stats(text: Column) -> dict[str, Column]:
    """C4-style line-filter statistics as pure columns (Raffel et al. 2020,
    "Exploring the Limits of Transfer Learning…", §2.2): lines split on
    newline; a line is KEPT when it ends in terminal punctuation and has
    at least five words; page flags for 'lorem ipsum', literal '{', and
    javascript-mentioning lines. The page-keep rule (≥3 kept lines, no
    lorem-ipsum, no brace) mirrors the published heuristic — C4 counts
    sentences, this engine counts kept lines (documented deviation; the
    oracle pins the same rule). Returns a dict of named columns so callers
    project what they need; each projected column re-embeds the line
    split — prefer ``c4_line_struct`` behind ``F.inline`` in hot paths."""
    return _c4_stats_from(text, _nonempty_lines(text))


def c4_line_struct(text: Column) -> Column:
    """Single-evaluation form of ``c4_line_stats``: the text and its
    trimmed-lines array are let-bound (dedup._let) and all seven columns
    live in ONE struct — project it with ``F.inline(F.array(...))`` so the
    Generate boundary pins exactly one tokenization per row under any
    plan shape (CollapseProject cannot substitute through it)."""
    return _let(
        text,
        lambda t: _let(
            _nonempty_lines(t),
            lambda lns: F.struct(
                *[c.alias(n) for n, c in _c4_stats_from(t, lns).items()]
            ),
        ),
    )


# Gopher quality rules (Rae et al. 2021, "Scaling Language Models: ...
# Gopher", Appendix A1.1 MassiveWeb quality filtering). The published
# thresholds, kept verbatim so the keep-bit means what the paper means.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_GOPHER_BULLETS = ("•", "-", "*")


def gopher_quality_stats(text: Column) -> dict[str, Column]:
    """Gopher / MassiveWeb quality-filter statistics as pure columns
    (Rae et al. 2021 §A1.1): a document is kept when ALL of
    50 ≤ word count ≤ 100,000; 3 ≤ mean word length ≤ 10;
    symbol-to-word ratio ≤ 0.1 (symbols: '#' and ellipsis);
    < 90% of lines start with a bullet; < 30% of lines end with an
    ellipsis; ≥ 80% of words carry an alphabetic character; and at least
    2 of the 8 Gopher stop words appear. Whole-stage-codegen expressions
    only; every ratio is emitted rounded (4 dp, +1e-9 nudge) and the
    keep rule compares the ROUNDED values so both engines agree at
    thresholds. Returns named columns for callers to project; each column
    re-embeds the word/line tokenization — prefer ``gopher_quality_struct``
    behind ``F.inline`` in hot paths."""
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")
    lines = _nonempty_lines(text)
    return _gopher_stats_from(text, words, lines)


def gopher_quality_struct(text: Column) -> Column:
    """Single-evaluation form of ``gopher_quality_stats``: text, words,
    and lines are let-bound (dedup._let) and all eight columns live in ONE
    struct — project it with ``F.inline(F.array(...))`` so the Generate
    boundary pins exactly one tokenization per row under any plan shape."""
    return _let(
        text,
        lambda t: _let(
            F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != ""),
            lambda ws: _let(
                _nonempty_lines(t),
                lambda lns: F.struct(
                    *[
                        c.alias(n)
                        for n, c in _gopher_stats_from(t, ws, lns).items()
                    ]
                ),
            ),
        ),
    )


def _gopher_stats_from(
    text: Column, words: Column, lines: Column
) -> dict[str, Column]:
    """Gopher stat columns given the words and trimmed non-empty lines
    arrays (inline expressions or let-bound lambda variables)."""
    n_words = F.size(words)
    total_len = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_len = F.when(
        n_words > 0, F.round(total_len / n_words + 1e-9, 4)
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.size(F.regexp_extract_all(text, F.lit("#"), F.lit(0)))
        + F.size(F.regexp_extract_all(text, F.lit(r"\.\.\."), F.lit(0)))
        + F.size(F.regexp_extract_all(text, F.lit("…"), F.lit(0)))
    )
    symbol_ratio = F.when(
        n_words > 0, F.round(n_symbols / n_words + 1e-9, 4)
    ).otherwise(F.lit(0.0))
    n_lines = F.size(lines)
    n_bullet = F.size(
        F.filter(lines, lambda ln: F.substring(ln, 1, 1).isin(*_GOPHER_BULLETS))
    )
    n_ellipsis = F.size(
        F.filter(lines, lambda ln: ln.endswith("...") | ln.endswith("…"))
    )
    bullet_frac = F.when(
        n_lines > 0, F.round(n_bullet / n_lines + 1e-9, 4)
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        n_lines > 0, F.round(n_ellipsis / n_lines + 1e-9, 4)
    ).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = F.when(
        n_words > 0, F.round(n_alpha / n_words + 1e-9, 4)
    ).otherwise(F.lit(0.0))
    low = F.lower(text)
    stop_hits = None
    for w in GOPHER_STOPWORDS:
        hit = low.rlike(rf"\b{w}\b").cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    keep = (
        (n_words >= 50)
        & (n_words <= 100000)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (symbol_ratio <= 0.1)
        & (bullet_frac < 0.9)
        & (ellipsis_frac < 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return {
        "n_words": n_words,
        "mean_word_len": mean_len,
        "symbol_word_ratio": symbol_ratio,
        "bullet_line_frac": bullet_frac,
        "ellipsis_line_frac": ellipsis_frac,
        "alpha_word_frac": alpha_frac,
        "n_stop_hits": stop_hits,
        "gopher_keep": keep,
    }


# ---------------------------------------------- Gopher repetition filters
# (Rae et al. 2021 Appendix A1.1, the REPETITION half of the MassiveWeb
# filter — the quality half is gopher_quality_stats above)

# published thresholds: (signal, max allowed fraction)
GOPHER_REP_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top_2gram_char_frac": 0.20,
    "top_3gram_char_frac": 0.18,
    "top_4gram_char_frac": 0.16,
    "dup_5gram_char_frac": 0.15,
    "dup_6gram_char_frac": 0.14,
    "dup_7gram_char_frac": 0.13,
    "dup_8gram_char_frac": 0.12,
    "dup_9gram_char_frac": 0.11,
    "dup_10gram_char_frac": 0.10,
}

def _dup_acc() -> Column:
    """Fold accumulator (built lazily — Column creation needs an active
    SparkContext, and this module imports before the session exists)."""
    return F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("dup_cnt"),
        F.lit(0).cast("long").alias("dup_mass"),
        F.lit(0).cast("long").alias("best_cnt"),
        F.lit(0).cast("long").alias("best_len"),
    )


def _close_run(acc: Column) -> Column:
    """Fold a finished run of equal items into the accumulator tallies."""
    plen = F.length(acc["prev"]).cast("long")
    better = (acc["run"] > acc["best_cnt"]) | (
        (acc["run"] == acc["best_cnt"]) & (plen > acc["best_len"])
    )
    return F.struct(
        acc["prev"].alias("prev"),
        acc["run"].alias("run"),
        (acc["dup_cnt"] + F.greatest(acc["run"] - 1, F.lit(0))).alias("dup_cnt"),
        (acc["dup_mass"] + F.greatest(acc["run"] - 1, F.lit(0)) * plen).alias(
            "dup_mass"
        ),
        F.when(better, acc["run"]).otherwise(acc["best_cnt"]).alias("best_cnt"),
        F.when(better, plen).otherwise(acc["best_len"]).alias("best_len"),
    )


def dup_mass_stats(items: Column) -> Column:
    """Duplication statistics of a string-array column, computed IN-ROW
    (zero shuffle — the scale design for per-document repetition signals):
    sort the items, fold adjacent runs once, and return

        struct(n          total items,
               n_dup      items beyond the first of each distinct value,
               total_mass sum of char lengths over all items,
               dup_mass   char mass of the beyond-first occurrences,
               top_mass   count × char-length of the most frequent item
                          — ties broken toward the longer item)

    ``items`` is let-bound; the fold closes its final run in the
    aggregate's finish lambda. Empty arrays yield all-zero tallies."""

    def body(arr: Column) -> Column:
        s = F.array_sort(arr)
        folded = F.aggregate(
            s,
            _dup_acc(),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc["prev"], acc["run"] + 1)
                .otherwise(F.lit(1).cast("long"))
                .alias("run"),
                F.when(x == acc["prev"], acc["dup_cnt"])
                .otherwise(_close_run(acc)["dup_cnt"])
                .alias("dup_cnt"),
                F.when(x == acc["prev"], acc["dup_mass"])
                .otherwise(_close_run(acc)["dup_mass"])
                .alias("dup_mass"),
                F.when(x == acc["prev"], acc["best_cnt"])
                .otherwise(_close_run(acc)["best_cnt"])
                .alias("best_cnt"),
                F.when(x == acc["prev"], acc["best_len"])
                .otherwise(_close_run(acc)["best_len"])
                .alias("best_len"),
            ),
            lambda acc: _let(
                _close_run(acc),
                lambda c: F.struct(
                    F.size(arr).cast("long").alias("n"),
                    c["dup_cnt"].alias("n_dup"),
                    F.aggregate(
                        arr,
                        F.lit(0).cast("long"),
                        lambda m, x: m + F.length(x),
                    ).alias("total_mass"),
                    c["dup_mass"].alias("dup_mass"),
                    (c["best_cnt"] * c["best_len"]).alias("top_mass"),
                ),
            ),
        )
        return folded

    return _let(items, body)


def _strict_shingles(ws: Column, n: int) -> Column:
    """n-word shingles that are EMPTY (not whole-doc degenerate) below n
    words — repetition signals are inapplicable to sub-n docs, and the
    degenerate single gram would score top_frac = 1.0 and falsely fail
    every short document. ``ws`` must be a lambda variable or cheap ref."""
    return F.when(
        F.size(ws) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(ws) - n),
            lambda i: F.array_join(F.slice(ws, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _rep_frac(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.round(num / den + 1e-9, 4)).otherwise(F.lit(0.0))


def gopher_repetition_struct(text: Column) -> Column:
    """The REPETITION half of the Gopher/MassiveWeb filter (Rae et al.
    2021 Appendix A1.1) as ONE Generate-ready struct: duplicate line /
    paragraph fractions (by count and by character mass), the top-{2,3,4}-
    gram character fraction, and the duplicate-{5..10}-gram character
    fraction, each compared against the paper's published threshold and
    ANDed into ``rep_keep``.

    Spec notes (documented deviations, both engines pinned identical):
      * character fractions are OCCURRENCE-MASS ratios — (count-1)·len of
        duplicated items (resp. count·len of the most frequent item) over
        count·len summed across all items — not positional coverage
        (coverage needs interval merging; the mass ratio is monotone in it
        and bounded by 1).
      * paragraphs split on blank lines (\\n{2,}); lines on \\n; n-grams
        over ``normalized_words``. Sub-n docs yield empty gram sets and
        fraction 0, never a degenerate whole-doc gram. Docs BARELY above n
        words still fail the top-gram thresholds arithmetically (3 words →
        top 2-gram ≥ 0.5 of the gram mass) — faithful to the reference
        implementations, which compute the signal regardless of length;
        Gopher's ≥50-word rule in ``gopher_quality_stats`` is the intended
        companion gate for short documents.
      * most-frequent-gram ties break toward the LONGER gram; equal-length
        ties are value-independent (count × length is what's reported).
      * keep compares the ROUNDED fractions (4 dp, +1e-9 nudge) so both
        engines agree at thresholds.

    Everything is computed in-row (let-bound arrays, one sorted fold per
    signal family, zero shuffle) — project with ``F.inline(F.array(...))``.
    Cost: 11 sorted folds per document (~100 ms/core on 1-2 KB docs,
    interpreted HOF) — linear, embarrassingly parallel, and run once per
    corpus; drop unused families from GOPHER_REP_THRESHOLDS to slim it."""

    def body(t: Column) -> Column:
        words = normalized_words(t)
        paras = F.filter(
            F.transform(F.split(t, r"\n{2,}"), lambda p: F.trim(p)),
            lambda p: p != "",
        )

        def with_stats(sa: Column) -> Column:
            def st(i: int) -> Column:
                return F.element_at(sa, i)

            fields = {
                "dup_line_frac": _rep_frac(st(1)["n_dup"], st(1)["n"]),
                "dup_line_char_frac": _rep_frac(
                    st(1)["dup_mass"], st(1)["total_mass"]
                ),
                "dup_para_frac": _rep_frac(st(2)["n_dup"], st(2)["n"]),
                "dup_para_char_frac": _rep_frac(
                    st(2)["dup_mass"], st(2)["total_mass"]
                ),
            }
            for n in (2, 3, 4):
                fields[f"top_{n}gram_char_frac"] = _rep_frac(
                    st(n + 1)["top_mass"], st(n + 1)["total_mass"]
                )
            for n in range(5, 11):
                fields[f"dup_{n}gram_char_frac"] = _rep_frac(
                    st(n + 1)["dup_mass"], st(n + 1)["total_mass"]
                )
            keep = None
            for name, thr in GOPHER_REP_THRESHOLDS.items():
                cond = fields[name] <= thr
                keep = cond if keep is None else keep & cond
            fields["rep_keep"] = keep
            return F.struct(*[c.alias(n) for n, c in fields.items()])

        def with_words(ws: Column) -> Column:
            stats = [
                dup_mass_stats(_nonempty_lines(t)),
                dup_mass_stats(paras),
                *[dup_mass_stats(_strict_shingles(ws, n)) for n in range(2, 11)],
            ]
            return _let(F.array(*stats), with_stats)

        return _let(words, with_words)

    return _let(text, body)


# FineWeb custom filters (Penedo et al. 2024, "The FineWeb Datasets",
# §3.3 — the three line-level heuristics developed on top of the
# C4/Gopher batteries, thresholds as published)
FINEWEB_SHORT_LINE_CHARS = 30
FINEWEB_THRESHOLDS = {
    "short_line_frac": 0.67,  # keep when <= (drop: too many short lines)
    "dup_line_char_frac": 0.01,  # keep when <= (drop: >1% duplicated chars)
    "terminal_punct_line_frac": 0.12,  # keep when >= (drop: unpunctuated)
}


def fineweb_quality_struct(text: Column) -> Column:
    """The three published FineWeb line-level heuristics as ONE
    Generate-ready struct: the fraction of lines shorter than 30 chars
    (<= 0.67 to keep), the character fraction of duplicated lines
    (<= 0.01 — char mass of beyond-first occurrences over total line
    mass, the ``dup_mass_stats`` ratio), and the fraction of lines ending
    in C4 terminal punctuation (>= 0.12). ``fineweb_keep`` ANDs the three
    rounded comparisons; fractions round 4 dp with the +1e-9 nudge so
    both engines agree at thresholds. Line-less docs score 0 everywhere
    and fail only the terminal-punctuation floor — matching the reference
    pipeline, which drops empty pages. In-row only (one let-bound lines
    array, one sorted fold) — project with ``F.inline(F.array(...))``."""

    def body(t: Column) -> Column:
        def with_lines(lns: Column) -> Column:
            def with_dup(d: Column) -> Column:
                n = F.size(lns)
                short = F.size(
                    F.filter(lns, lambda ln: F.length(ln) < FINEWEB_SHORT_LINE_CHARS)
                )
                punct = F.size(
                    F.filter(
                        lns, lambda ln: F.substring(ln, -1, 1).isin(*_C4_TERMINAL)
                    )
                )
                short_frac = _rep_frac(short, n)
                dup_frac = _rep_frac(d["dup_mass"], d["total_mass"])
                punct_frac = _rep_frac(punct, n)
                return F.struct(
                    n.alias("n_lines"),
                    short_frac.alias("short_line_frac"),
                    dup_frac.alias("dup_line_char_frac"),
                    punct_frac.alias("terminal_punct_line_frac"),
                    (
                        (short_frac <= FINEWEB_THRESHOLDS["short_line_frac"])
                        & (dup_frac <= FINEWEB_THRESHOLDS["dup_line_char_frac"])
                        & (
                            punct_frac
                            >= FINEWEB_THRESHOLDS["terminal_punct_line_frac"]
                        )
                    ).alias("fineweb_keep"),
                )

            return _let(dup_mass_stats(lns), with_dup)

        return _let(_nonempty_lines(t), with_lines)

    return _let(text, body)


def _marker_hits(text: Column, markers: list[str]) -> Column:
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(0)))


def _script_count(text: Column, char_range: str) -> Column:
    """Codepoints of ``text`` inside a literal BMP character-class range.
    length() counts codepoints in both Spark (UTF8String.numChars) and
    DuckDB, and regexp_replace with a literal range behaves identically in
    Java regex and RE2, so the count is engine-exact."""
    return F.length(text) - F.length(
        F.regexp_replace(text, "[" + char_range + "]", "")
    )


def _latin_vote(text: Column) -> Column:
    hits = [_marker_hits(text, LANG_MARKERS[lang]) for lang in LANG_PRIORITY]
    result = F.lit("und")
    for i in range(len(LANG_PRIORITY) - 1, -1, -1):
        cond = hits[i] > 0
        for j in range(i + 1, len(LANG_PRIORITY)):
            cond = cond & (hits[i] >= hits[j])
        result = F.when(cond, F.lit(LANG_PRIORITY[i])).otherwise(result)
    return result


def lang_id(text: Column) -> Column:
    """Heuristic language ID. CJK script-range counting decides FIRST
    (priority kana > hangul > han, each needing >= CJK_MIN_CHARS
    codepoints of its deciding block); otherwise the Latin marker vote:
    argmax of per-language function-word hits, 'und' when nothing
    matches. Fixed tie order = LANG_PRIORITY (a language wins when its
    count is positive and >= every LOWER-priority language's count — the
    when-chain makes higher-priority wins structural). The DuckDB oracle
    mirrors both chains exactly (queries._lang_case_sql, generated from
    the same tables)."""
    scripts = {k: _script_count(text, CJK_SCRIPTS[k]) for k in CJK_PRIORITY}
    result = _latin_vote(text)
    for lang in reversed(CJK_PRIORITY):
        result = F.when(
            scripts[lang] >= CJK_MIN_CHARS, F.lit(lang)
        ).otherwise(result)
    return result


def hashed_linear_score(
    df,
    weights,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    round_to: int = 4,
):
    """fastText-style hashed bag-of-words linear scorer — the model-based
    quality-filter tier (DCLM and FineWeb-Edu run a small classifier over
    every crawl document and keep the top fraction; the heuristic
    batteries only gate what this ranks). ``weights`` is a ``(b, weight)``
    DataFrame — in production the exported classifier vector loaded as a
    table; features are hashed unigram buckets
    ``pmod(stable_hash(token), n_buckets)``. Per doc:

      score = (Σ_t weight[bucket(t)]) / n_tokens      (mean pooling)
      prob  = sigmoid(score), computed FROM the rounded score
      keep  = rounded score ≥ 0

    Docs with zero tokens produce no row (nothing to pool) — compose with
    a left join when totality is needed. Cross-engine determinism: the
    dot product folds (b, c·w) structs sorted by bucket (doubles add in
    one fixed order), score/prob round with the +1e-9 nudge, and the
    sigmoid exps the ALREADY-ROUNDED score so both engines transcend the
    same input.

    Plan shape (the 10^12 one): ONE (id, bucket, c) combining groupBy
    from the shared tokenizer, the ≤ n_buckets-row weight table broadcast
    back, one per-doc fold. Nothing scales with corpus × buckets, no UDF,
    no count-distinct."""
    from pyspark.sql import functions as F

    from ocr_model_spark.operators.dedup import stable_hash, words_frame

    worded = words_frame(df, id_col, text_col).filter(
        F.col("w").isNotNull() & (F.size("w") > 0)
    )
    bc = (
        worded.select("id", F.explode("w").alias("t"))
        .select("id", F.pmod(stable_hash(F.col("t")), F.lit(n_buckets)).alias("b"))
        .groupBy("id", "b")
        .agg(F.count("*").alias("c"))
    )
    joined = bc.join(F.broadcast(weights), "b", "left").withColumn(
        "weight", F.coalesce("weight", F.lit(0.0))
    )
    per_doc = joined.groupBy(F.col("id").alias(id_col)).agg(
        F.sum("c").alias("n_tokens"),
        F.collect_list(
            F.struct("b", (F.col("c") * F.col("weight")).alias("x"))
        ).alias("bx"),
    )
    score = F.round(
        F.aggregate(F.sort_array("bx"), F.lit(0.0), lambda acc, e: acc + e["x"])
        / F.col("n_tokens")
        + 1e-9,
        round_to,
    )
    scored = per_doc.select(id_col, "n_tokens", score.alias("score"))
    return scored.select(
        id_col,
        "n_tokens",
        "score",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))) + 1e-9, round_to).alias(
            "prob"
        ),
        (F.col("score") >= 0.0).alias("clf_keep"),
    )


def dsir_importance(
    df,
    target,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    smoothing: float = 0.5,
    round_to: int = 4,
):
    """DSIR-style importance weight per document (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): hashed
    bigram features, per-bucket log-ratio of the TARGET distribution over
    the SOURCE (raw-corpus) distribution, and per-doc weight
    log w(x) = Σ_b c_x[b]·(log p_t[b] − log p_s[b]). Training pipelines
    sample raw data proportionally to w to match a high-quality target
    (Wikipedia/books) — the published selection method between pure
    quality filters and model-based scoring.

    Plan shape: ONE (id, bucket, c) frame from the corpus (tokenize →
    bigram → hash-mod — a combining groupBy), bucket totals for source
    and target (two keyed aggregates over ≤ n_buckets rows), the
    log-ratio table BROADCAST back, per-doc sorted fold. Nothing scales
    with corpus × buckets; the ratio table is n_buckets rows regardless
    of corpus size. Cross-engine determinism: log-ratios rounded to 6
    (ln ulp guard), fold sorted by bucket, final round +1e-9 nudge —
    the house double-parity rules."""
    from pyspark.sql import functions as F

    from ocr_model_spark.operators.dedup import stable_hash, words_frame

    def bucket_counts(frame):
        worded = words_frame(frame, id_col, text_col).filter(
            F.col("w").isNotNull() & (F.size("w") >= 2)
        )
        bigrams = F.transform(
            F.sequence(F.lit(1), F.size("w") - 1),
            lambda i: F.concat_ws(" ", F.element_at("w", i), F.element_at("w", i + 1)),
        )
        return (
            worded.select("id", F.explode(bigrams).alias("g"))
            .select("id", F.pmod(stable_hash(F.col("g")), F.lit(n_buckets)).alias("b"))
            .groupBy("id", "b")
            .agg(F.count("*").alias("c"))
        )

    src = bucket_counts(df).localCheckpoint(eager=False)  # feeds totals AND the fold
    tgt = bucket_counts(target)
    src_tot = src.groupBy("b").agg(F.sum("c").alias("sc"))
    tgt_tot = tgt.groupBy("b").agg(F.sum("c").alias("tc"))
    totals = F.broadcast(
        src_tot.agg(F.sum("sc").alias("s_all")).crossJoin(
            tgt_tot.agg(F.sum("tc").alias("t_all"))
        )
    )
    ratio = F.broadcast(
        src_tot.join(tgt_tot, "b", "left")
        .withColumn("tc", F.coalesce("tc", F.lit(0)))
        .crossJoin(totals)
        .select(
            "b",
            F.round(
                F.log(
                    (F.col("tc") + smoothing)
                    / (F.col("t_all") + smoothing * n_buckets)
                )
                - F.log(
                    (F.col("sc") + smoothing)
                    / (F.col("s_all") + smoothing * n_buckets)
                )
                + 1e-9,
                6,
            ).alias("lr"),
        )
    )
    return (
        src.join(ratio, "b")
        .groupBy(F.col("id").alias(id_col))
        .agg(F.collect_list(F.struct("b", (F.col("c") * F.col("lr")).alias("x"))).alias("bx"))
        .select(
            id_col,
            F.round(
                F.aggregate(
                    F.sort_array("bx"), F.lit(0.0), lambda acc, e: acc + e["x"]
                )
                + 1e-9,
                round_to,
            ).alias("dsir_logweight"),
        )
    )


def token_budget_sample(
    df,
    budget_per_lang: int,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Per-language token-budget sampling — the corpus-mixing step of a
    training pipeline (FineWeb/DoReMi-style: each language/domain gets a
    token quota, not a document quota). Deterministic spec: every doc gets
    ``lang`` (:func:`lang_id`), ``n_tokens``
    (:func:`multilingual_token_count` — the normalized_words count plus
    one token per CJK codepoint, so zh/ja/ko quotas fill at realistic
    rates instead of ~0 tokens/doc), and a priority = md5-prefix stable
    hash of the STRING id;
    docs are taken per language in (priority, id) order while the running
    token total BEFORE the doc is under the budget. The boundary doc is
    kept (simple, total rule: ``cum_before < budget``) so quotas overshoot
    by at most one document.

    Plan shape: one projection pass, then ONE window keyed on lang —
    partitions are per-language and the order key is a precomputed hash
    column. At 10^12 docs the per-lang cumulative sum is the only wide
    state; a range-partitioned sort on (lang, priority) is exactly what
    Spark's window exchange does, and no payload column survives the
    projection."""
    scored = df.select(
        F.col(id_col).alias("id"),
        lang_id(F.col(text_col)).alias("lang"),
        multilingual_token_count(F.col(text_col)).alias("n_tokens"),
        stable_hash(F.col(id_col).cast("string")).alias("priority"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("priority", "id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return scored.select(
        F.col("id").alias(id_col),
        "lang",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
        (F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) < budget_per_lang).alias(
            "kept"
        ),
    )


def lang_confidence(text: Column) -> Column:
    """Vote-share confidence for :func:`lang_id`, in [0,1].

    CJK winners (mirroring lang_id's script chain): the winning
    language's script codepoints over ALL evidence — the three script
    counts plus every Latin marker hit. Japanese credits kana AND han
    (kanji belong to Japanese running text); Korean credits hangul;
    Chinese credits han. Latin winners keep the round-5 semantics:
    winner_hits / total_hits — the when-chain winner always carries the
    maximum count (it must beat every lower-priority language and a
    higher-priority language with a bigger count would have won
    instead), so greatest(hits) IS the winner's count. 0.0 when nothing
    fires anywhere → lang_id said 'und'. Downstream filters can
    threshold: 1.0 = unambiguous, 0.5 = split two ways. Division-derived
    double → the house +1e-9 nudge before round-4."""
    hits = [_marker_hits(text, LANG_MARKERS[lang]) for lang in LANG_PRIORITY]
    total = hits[0]
    for h in hits[1:]:
        total = total + h
    latin_conf = F.when(
        total > 0, F.round(F.greatest(*hits) / total + 1e-9, 4)
    ).otherwise(F.lit(0.0))
    s = {k: _script_count(text, CJK_SCRIPTS[k]) for k in CJK_PRIORITY}
    denom = s["ja"] + s["ko"] + s["zh"] + total
    credit = {"ja": s["ja"] + s["zh"], "ko": s["ko"], "zh": s["zh"]}
    result = latin_conf
    for lang in reversed(CJK_PRIORITY):
        result = F.when(
            s[lang] >= CJK_MIN_CHARS,
            F.round(credit[lang] / denom + 1e-9, 4),
        ).otherwise(result)
    return result


def multilingual_token_count(text: Column) -> Column:
    """Token count valid for whitespace-delimited AND unsegmented CJK
    scripts: the ``normalized_words`` count (whose [^a-z0-9 ] strip
    removes CJK codepoints entirely) plus ONE token per Han / kana /
    Hangul codepoint — the standard rough 1-char≈1-token rule for
    unsegmented scripts. Without the CJK term a Chinese document counts
    ~0 tokens, so a per-language token budget would admit unbounded zh
    docs (and length/quality ratios silently treat CJK text as empty)."""
    cjk = _script_count(text, CJK_ALL_CLASS)
    return (F.size(normalized_words(text)) + cjk).cast("long")


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (the reference's word_count:
    ``len(text.split())``, document_processor.py:815)."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, 0).otherwise(F.size(F.split(t, r"\s+")))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and isolated symbols
    counted separately — the standard pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[\.,;:!\?]", ""))
    return F.when(F.length(text) > 0, F.round(n_punct / F.length(text), 6)).otherwise(0.0)


def stopword_ratio(text: Column) -> Column:
    hits = _marker_hits(text, _EN_STOPWORDS)
    n = ws_token_count(text)
    return F.when(n > 0, F.round(hits / n, 6)).otherwise(0.0)


def mean_word_length(text: Column) -> Column:
    words = normalized_words(text)
    total = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(F.size(words) > 0, F.round(total / F.size(words), 6)).otherwise(0.0)


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]: length factor × word-shape factor, minus a
    punctuation-spam penalty. Deterministic spec (tests + oracle pin it):

        length_f = least(1, n_chars/500)
        shape_f  = 1 if 3 <= mean_word_len <= 10 else 0.5
        penalty  = least(0.5, 2 * punct_ratio)
        score    = round(greatest(0, length_f * shape_f - penalty), 6)

    The words array and the mean-word-length scalar are ``_let``-bound so
    the tokenize regex runs ONCE per row regardless of how many times the
    enclosing expression is referenced (``quality_bucket(score)`` compares
    the score twice; naive inlining re-ran the tokenizer ~20× per row —
    the dominant cost of the quality_scores slot)."""
    length_f = F.least(F.lit(1.0), F.length(text) / 500.0)
    penalty = F.least(F.lit(0.5), 2.0 * punct_ratio(text))

    def with_words(ws: Column) -> Column:
        total = F.aggregate(ws, F.lit(0), lambda acc, w: acc + F.length(w))
        mwl_val = F.when(F.size(ws) > 0, F.round(total / F.size(ws), 6)).otherwise(0.0)

        def with_mwl(mwl: Column) -> Column:
            shape_f = F.when((mwl >= 3.0) & (mwl <= 10.0), F.lit(1.0)).otherwise(
                F.lit(0.5)
            )
            return F.round(F.greatest(F.lit(0.0), length_f * shape_f - penalty), 6)

        return _let(mwl_val, with_mwl)

    return _let(normalized_words(text), with_words)


def quality_bucket(score: Column) -> Column:
    """The reference's quality buckets (advanced_ocr_app.py:734-746):
    high > 0.9, medium in [0.7, 0.9], low < 0.7."""
    return (
        F.when(score > 0.9, F.lit("high"))
        .when(score >= 0.7, F.lit("medium"))
        .otherwise(F.lit("low"))
    )


def doc_fingerprint(text: Column) -> Column:
    """Position-sensitive rolling document fingerprint:
    ``sum((i+1) * stable_hash(word_i)) mod M`` over normalized words —
    order-sensitive (unlike a bag hash), expression-only, oracle-matchable."""
    def body(words: Column) -> Column:
        idx = F.sequence(F.lit(1), F.size(words))
        weighted = F.zip_with(
            words,
            idx,
            lambda w, i: F.pmod(i.cast("long") * stable_hash(w), F.lit(FINGERPRINT_MOD)),
        )
        return F.when(
            F.size(words) > 0,
            F.aggregate(
                weighted,
                F.lit(0).cast("long"),
                lambda acc, x: F.pmod(acc + x, F.lit(FINGERPRINT_MOD)),
            ),
        ).otherwise(F.lit(0).cast("long"))

    # _let: the words array evaluates once per row (the tokenize regex
    # appeared 4× in the naive expression — size twice, zip_with, guard)
    return _let(normalized_words(text), body)


# --------------------------------------------------------------- PII scrub

# conservative patterns valid (and identical in behavior) in BOTH Java
# regex and RE2 — the oracle runs them in DuckDB verbatim
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(text: Column) -> Column:
    """Redact emails then IPv4 literals (training corpora must not leak
    contact data). Order matters and is part of the contract: the email
    pattern can consume dotted-quad-looking hosts, so it runs first."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
    )


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_ips) match counts per row."""
    emails = F.size(F.regexp_extract_all(text, F.lit(EMAIL_RE), F.lit(0)))
    ips = F.size(
        F.regexp_extract_all(
            F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), F.lit(IPV4_RE), F.lit(0)
        )
    )
    return emails, ips


# ------------------------------------------------- repetition (Gopher-style)


def repetition_profile(df, id_col: str = "doc_id", text_col: str = "text", *, words=None):
    """Per-document repetition metrics in the spirit of the published
    Gopher/MassiveText quality filters (duplicate-content fractions):
    distinct-word fraction, most-frequent-word fraction, most-frequent-
    bigram fraction. Highly repetitive documents (boilerplate, keyword
    stuffing, generation loops) score low/high respectively and get
    filtered before training.

    In-row shape (r7 — the ``dup_mass_stats`` design): every signal is a
    per-document function of its own words array, so each is computed by
    ONE sorted run-length fold inside the row — zero shuffles, no
    (doc, gram) explode (the r6 relational shape shuffled every token and
    every bigram twice; the per-(doc, gram) counts it aggregated are
    exactly the run lengths of the sorted array, so the integers — and
    therefore the rounded fractions — are identical by construction).
    Uses the engine-wide normalized tokenization (shared with the dedup
    family and its oracles). Pass a pre-built ``words`` frame
    (``dedup.words_frame``, ideally localCheckpoint'ed) to share one
    tokenization pass with sibling gram aggregates in the same slot."""
    from pyspark.sql import functions as F

    from ocr_model_spark.operators.dedup import words_frame

    # w is null iff text was null, so the null filter is equivalent either way
    worded = words if words is not None else words_frame(df, id_col, text_col)
    base = worded.filter(F.col("w").isNotNull() & (F.size("w") > 0))

    r = lambda c: F.round(c + 1e-9, 4)  # noqa: E731 — oracle rounding rule

    def body(ws: Column) -> Column:
        n_words = F.size(ws).cast("long")
        # guard: sequence(1, 0) DESCENDS in Spark, so a single-word doc
        # would index element_at(w, 0) — emit no bigrams instead
        bigram_arr = F.when(
            F.size(ws) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at(ws, i), F.element_at(ws, i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))

        def with_stats(wst: Column) -> Column:
            def with_bigrams(bs: Column) -> Column:
                def with_bstats(bst: Column) -> Column:
                    return F.struct(
                        n_words.alias("n_words"),
                        r(wst["n_distinct"] / n_words).alias("distinct_word_frac"),
                        r(wst["top_n"] / n_words).alias("top_word_frac"),
                        r(
                            F.coalesce(
                                bst["top_n"] / F.size(bs).cast("long"),
                                F.lit(0.0),
                            )
                        ).alias("top_bigram_frac"),
                    )

                return _let(_sorted_run_stats(bs), with_bstats)

            return _let(bigram_arr, with_bigrams)

        return _let(_sorted_run_stats(ws), with_stats)

    return base.select(
        F.col("id").alias(id_col), F.inline(F.array(_let(F.col("w"), body)))
    )


def _sorted_run_stats(arr: Column) -> Column:
    """struct(top_n, n_distinct) of a string-array column, computed by one
    sorted run-length fold IN-ROW: ``top_n`` = the highest occurrence
    count of any distinct value (≡ max of the per-(doc, gram) groupBy
    counts), ``n_distinct`` = the distinct-value count. Longs, matching
    the aggregate-path types. The ``""`` sentinel for ``prev`` is safe:
    normalized words and their space-joined grams are never empty.
    Empty arrays yield (0, 0)."""

    def body(s: Column) -> Column:
        folded = F.aggregate(
            s,
            F.struct(
                F.lit("").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("top_n"),
                F.lit(0).cast("long").alias("n_distinct"),
            ),
            lambda acc, x: _let(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
                lambda run: F.struct(
                    x.alias("prev"),
                    run.alias("run"),
                    F.greatest(acc["top_n"], run).alias("top_n"),
                    (
                        acc["n_distinct"]
                        + F.when(x == acc["prev"], F.lit(0).cast("long")).otherwise(
                            F.lit(1).cast("long")
                        )
                    ).alias("n_distinct"),
                ),
            ),
            lambda acc: F.struct(
                acc["top_n"].alias("top_n"), acc["n_distinct"].alias("n_distinct")
            ),
        )
        return folded

    return _let(F.array_sort(arr), body)


def unigram_logprob_quality(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_top_k: int | None = None,
):
    """CCNet-style LM quality score, unigram variant: per-document mean
    negative log-probability of its words under the CORPUS unigram
    distribution. Fluent/typical documents score low, gibberish and
    boilerplate-stuffed ones high — the ranking signal CCNet uses (with a
    wiki LM) to stratify training data into quality buckets.

    Two passes, both relational, over per-(doc, word) COUNT pairs (the
    distinct-pair frame — several-fold less shuffle volume than raw token
    rows): (1) corpus word frequencies — one combining groupBy on the word
    key; (2) word→frequency join and a per-doc fold. The frequency table
    is vocabulary-sized (sublinear in the corpus) — and at web scale the
    long tail of hapax tokens (typos, ids, hashes) still makes it huge, so
    ``vocab_top_k`` caps it: keep the top-K words by corpus count (ties by
    word — a total order, so the capped vocab is deterministic) and give
    every out-of-vocabulary word the FLOOR probability 1/total (the
    probability of a count-1 word). OOV words have true counts anywhere in
    [1, K-th count], so the floor UNDERSTATES (or matches) their
    probability — capping can only RAISE a document's mean neg-logprob,
    i.e. capped scores are an upper bound on the uncapped score (pinned by
    the test below). With
    K >= |vocab| the capped path is bitwise-identical to the uncapped one
    (pinned by tests/test_operators_misc.py).

    The mean is computed by a FIXED-ORDER fold (collect per-doc terms,
    sort by word, HOF-aggregate) — ``avg()``'s partial-sum order varies
    with partitioning (the repo-wide stable-mean rule, similarity.py), and
    the oracle folds in the same word order, so the sums are bitwise
    comparable before the final round."""
    from pyspark.sql import functions as F

    from ocr_model_spark.operators.dedup import _spread, normalized_words

    # spread the narrow (id, text) projection before tokenizing: a
    # single-file scan is ONE task, and the tokenize+explode is the
    # CPU-dominant stage of this operator (no-op at real scale)
    base = _spread(
        df.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col).alias("id"), F.col(text_col).alias("t")
        ),
        "id",
    )
    pairs = (
        base.select("id", normalized_words(F.col("t")).alias("w"))
        .filter(F.size("w") > 0)
        .select("id", F.explode("w").alias("g"))
        .groupBy("id", "g")
        .agg(F.count("*").alias("c"))
    )
    vocab = pairs.groupBy("g").agg(F.sum("c").alias("cnt"))
    # total over ALL words — summed from the UNCAPPED vocab partials, not
    # from a second full pass over `pairs` (Σ_g cnt(g) ≡ Σ c exactly:
    # integer sums are order-insensitive, so this saves one whole scan of
    # the (id, g, c) frame while keeping the value bit-identical); the
    # distribution stays normalized over the full corpus even when the
    # vocab is capped below
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    if vocab_top_k is not None:
        # global top-K by (count desc, word asc — a total order) runs as
        # TakeOrderedAndProject: no full sort materializes
        vocab = vocab.orderBy(F.desc("cnt"), F.asc("g")).limit(vocab_top_k)
    terms = (
        pairs.join(vocab, "g", "left" if vocab_top_k is not None else "inner")
        .crossJoin(total)  # one-row relation: broadcast, duplicates nothing
        .select(
            "id",
            "c",
            F.struct(
                F.col("g"),
                (
                    F.col("c")
                    # OOV floor: count-1 probability (see docstring)
                    * -F.log(F.coalesce(F.col("cnt"), F.lit(1)) / F.col("total"))
                ).alias("wnlp"),
            ).alias("t"),
        )
    )
    folded = terms.groupBy(F.col("id").alias(id_col)).agg(
        # integer sums are order-insensitive — only the DOUBLE sum needs
        # the fixed-order fold
        F.sum("c").alias("n_words"),
        F.sort_array(F.collect_list("t")).alias("a"),  # sorted by g: total order
    )
    sum_nlp = F.aggregate(F.col("a"), F.lit(0.0), lambda acc, x: acc + x["wnlp"])
    return folded.select(
        id_col,
        "n_words",
        F.round(sum_nlp / F.col("n_words") + 1e-9, 4).alias("avg_neg_logp"),
    )
