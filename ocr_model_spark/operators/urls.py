"""URL canonicalization and per-host corpus balancing — crawl-side
operators a training pipeline runs before dedup/sampling.

Canonicalization policy (deliberately conservative, and expressed ONLY
with constructs whose semantics are identical in Java regex and RE2 so
the DuckDB oracle can mirror it verbatim — no replacement backreferences,
which differ between the dialects):

  1. strip the fragment;
  2. lowercase scheme://host (path/query case is significant, host case
     is not);
  3. strip default ports (http:80, https:443);
  4. drop tracking parameters (utm_*, fbclid, gclid) wherever they sit in
     the query string, tidying separators;
  5. strip a trailing bare '?' or '&'.

Per-host capping: crawls are Zipf-skewed, and training mixes cap documents
per domain; the keep-set must be DETERMINISTIC (replays keep the same
rows), so ranking uses the md5-prefix stable hash of the url, never rand().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid)=[^&]*"

# ONE host-extraction definition for every oracled host-keyed operator,
# in a dialect shared verbatim by Java regex and RE2 (the oracle SQL
# interpolates THIS constant — no hand copies): userinfo dropped greedily
# to the LAST '@' of the authority (RFC 3986 — varying userinfo must not
# let a domain evade per-host caps), host ends at : / ? # @. Pure regex
# beats parse_url here — parse_url THROWS on malformed urls and
# try_parse_url yields NULL for underscore hosts (ubiquitous in real
# crawls), which would collapse distinct hosts into one NULL group AND
# diverge from any SQL oracle; regexp_extract returns '' on no-match in
# BOTH engines, so even malformed urls group identically on both sides.
URL_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#]*@)?([^/?#:@]+)"


def url_host(url: Column | str = "url") -> Column:
    col = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(col, URL_HOST_RE, 1)


def canonical_url(url: Column) -> Column:
    """Pure-expression canonical form (see module docstring for the
    policy); codegen'd, no UDF, oracle-mirrorable.

    Dialect notes (review-hardened): anchors use ``(?s)…`` / ``\\z`` —
    Java's ``$`` matches before a trailing newline while RE2's does not,
    so ``$`` would desynchronize the two engines on a url with trailing
    whitespace. Tracking-param stripping is scoped to the QUERY STRING
    (split at the first '?'): a literal ``&gclid=`` in the PATH is legal
    per RFC 3986 and must not swallow the rest of the path."""
    u0 = F.regexp_replace(url, r"(?s)#.*", "")
    head = F.lower(F.regexp_extract(u0, r"^[^/?#]*://[^/?#]*", 0))
    head = (
        F.when(
            head.startswith("http://") & head.endswith(":80"),
            head.substr(F.lit(1), F.length(head) - 3),
        )
        .when(
            head.startswith("https://") & head.endswith(":443"),
            head.substr(F.lit(1), F.length(head) - 4),
        )
        .otherwise(head)
    )
    rest = F.regexp_replace(u0, r"^[^/?#]*://[^/?#]*", "")
    u1 = F.concat(head, rest)
    base = F.regexp_extract(u1, r"^[^?]*", 0)
    q = F.regexp_replace(u1, r"^[^?]*", "")
    q = F.regexp_replace(q, "&" + TRACKING_PARAM_RE, "")
    q = F.regexp_replace(q, r"\?" + TRACKING_PARAM_RE + "&", "?")
    q = F.regexp_replace(q, r"\?" + TRACKING_PARAM_RE + r"\z", "")
    return F.regexp_replace(F.concat(base, q), r"[?&]+\z", "")


# Embedded slice of the Public Suffix List — the suffixes that dominate
# web crawls (generic TLDs, the common ccTLD second-level registries, and
# the bare ccTLDs those registries live under). Production swaps in the
# full published PSL the same way: a literal in-expression array (the
# whole list is ~10k entries — still O(KB) in the plan and loop-free);
# wildcard (*.ck) and exception (!www.ck) rules are intentionally not
# modeled (rare; a full-PSL build would pre-expand them into this table).
# The PSL default rule applies: a host whose tail matches NO entry treats
# its last label as the public suffix.
PUBLIC_SUFFIXES = (
    # generic TLDs
    "com", "org", "net", "edu", "gov", "mil", "int", "info", "biz",
    "io", "co", "ai", "dev", "app", "xyz", "online", "site", "me", "tv",
    # ccTLD second-level registries
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.br", "net.br", "org.br",
    "co.in", "net.in", "org.in",
    "co.kr", "or.kr", "co.nz", "org.nz",
    "com.mx", "com.ar", "com.tr", "com.tw",
    # bare ccTLDs
    "uk", "de", "fr", "jp", "cn", "ru", "br", "in", "au", "ca", "it",
    "nl", "es", "se", "pl", "ch", "at", "be", "dk", "fi", "no", "cz",
    "kr", "nz", "mx", "ar", "tr", "tw", "us", "eu",
)

# IPv4 literal — PSL semantics never apply to addresses. \z not $ (Java's
# $ matches before a trailing newline, RE2's does not).
_IPV4_RE = r"^\d{1,3}(\.\d{1,3}){3}\z"


def psl_struct(host: Column) -> Column:
    """Public-suffix decomposition of a host as ONE struct
    ``(host_norm, public_suffix, reg_domain)`` — the eTLD+1 operator a
    crawl pipeline needs before any domain-level statistic (per-host
    capping treats blog1.example.co.uk and blog2.example.co.uk as two
    hosts; per-DOMAIN budgets, ownership dedup and contamination
    blocklists all key on the registrable domain instead).

    Semantics (PSL algorithm over the embedded table, longest match
    wins): the host is lowercased and FQDN trailing dots stripped;
    ``public_suffix`` is the longest table entry that equals the host or
    is its dotted tail (default rule: the bare last label when nothing
    matches); ``reg_domain`` is the suffix plus one label, or NULL when
    the host IS a public suffix (nothing is registrable). IPv4 literals
    short-circuit: NULL suffix, the address itself as reg_domain. Empty
    host → NULL everywhere.

    Scale shape: pure expressions end-to-end — the suffix table rides in
    the plan, the match is an in-row HOF over ~70 entries, zero shuffle,
    zero UDF. Every intermediate is let-bound (``dedup._let``) so the
    lower/strip/split chain runs once per row no matter how Catalyst
    collapses projections."""
    from ocr_model_spark.operators.dedup import _let

    table = F.array(*[F.lit(s) for s in PUBLIC_SUFFIXES])

    def with_host(hv: Column) -> Column:
        def with_labels(labels: Column) -> Column:
            matched = F.filter(
                table,
                lambda s: (hv == s) | hv.endswith(F.concat(F.lit("."), s)),
            )
            best = F.aggregate(
                matched,
                F.lit(""),
                lambda acc, x: F.when(F.length(x) > F.length(acc), x).otherwise(acc),
            )

            def with_best(b: Column) -> Column:
                n = F.size(labels)
                lcnt = F.when(b == "", F.lit(1)).otherwise(
                    F.size(F.split(b, r"\."))
                )
                suffix = F.concat_ws(".", F.slice(labels, n - lcnt + 1, lcnt))
                reg = F.when(
                    n >= lcnt + 1,
                    F.concat_ws(".", F.slice(labels, n - lcnt, lcnt + 1)),
                ).otherwise(F.lit(None).cast("string"))
                null_s = F.lit(None).cast("string")
                return F.struct(
                    F.when(hv == "", null_s).otherwise(hv).alias("host_norm"),
                    F.when(hv == "", null_s)
                    .when(hv.rlike(_IPV4_RE), null_s)
                    .otherwise(suffix)
                    .alias("public_suffix"),
                    F.when(hv == "", null_s)
                    .when(hv.rlike(_IPV4_RE), hv)
                    .otherwise(reg)
                    .alias("reg_domain"),
                )

            return _let(best, with_best)

        return _let(F.split(hv, r"\."), with_labels)

    h = F.regexp_replace(F.lower(host), r"\.+\z", "")
    return _let(h, with_host)


def registrable_domain(host: Column) -> Column:
    """The eTLD+1 column alone (see :func:`psl_struct`)."""
    return psl_struct(host)["reg_domain"]


# RefinedWeb-style URL filtering (Penedo et al. 2023 §3.1 + App. G run a
# domain blocklist and a weighted URL-word score before ANY content
# processing — rejecting by URL is the cheapest filter in the pipeline).
# Deterministic stand-in lists; production swaps in the curated blocklist
# (~4.6M domains in the paper) loaded as a broadcast table the same way.
URL_BLOCKLIST = ("badsite.example", "spam-mill.net", "tracker.co.uk")
# fixed ORDER matters: both engines sum the weights left-to-right
URL_SCORE_WORDS = (
    ("casino", 1.0),
    ("escort", 1.0),
    ("adult", 1.0),
    ("poker", 0.5),
    ("pills", 0.5),
    ("webcam", 0.5),
)
URL_SCORE_THRESHOLD = 1.0


def url_filter_struct(url: Column) -> Column:
    """URL-level keep/drop verdict as ONE struct ``(host, domain_blocked,
    url_word_score, url_keep)`` — the zero-content-cost front gate of a
    crawl pipeline. ``domain_blocked``: the host equals or is a subdomain
    of a blocklist entry (standard blocklist semantics — sub.bad.example
    is as blocked as bad.example). ``url_word_score``: the weighted sum
    of flagged words appearing anywhere in the lowercased url, rounded
    2 dp with the +1e-9 nudge. ``url_keep`` = not blocked AND score under
    the threshold.

    Pure expressions: blocklist and word table ride the plan as literals,
    matching is an in-row fold, zero shuffle/UDF; the lowercased url and
    host are let-bound so the regex runs once per row under any plan
    shape."""
    from functools import reduce

    from ocr_model_spark.operators.dedup import _let

    table = F.array(*[F.lit(d) for d in URL_BLOCKLIST])

    def with_lower(lo: Column) -> Column:
        score = F.round(
            reduce(
                lambda acc, wt: acc
                + F.when(lo.contains(wt[0]), F.lit(wt[1])).otherwise(F.lit(0.0)),
                URL_SCORE_WORDS,
                F.lit(0.0),
            )
            + 1e-9,
            2,
        )

        def with_host(hv: Column) -> Column:
            blocked = F.exists(
                table,
                lambda d: (hv == d) | hv.endswith(F.concat(F.lit("."), d)),
            )

            def with_score(sc: Column) -> Column:
                return F.struct(
                    hv.alias("host"),
                    blocked.alias("domain_blocked"),
                    sc.alias("url_word_score"),
                    (~blocked & (sc < URL_SCORE_THRESHOLD)).alias("url_keep"),
                )

            return _let(score, with_score)

        return _let(url_host(lo), with_host)

    return _let(F.lower(url), with_lower)


def cap_per_host(
    df: DataFrame,
    url_col: str = "url",
    k: int = 5,
    salt_buckets: int = 32,
) -> DataFrame:
    """Keep at most ``k`` rows per url-host, ranked by the deterministic
    md5-prefix hash of the url (ties by url) — balanced-corpus sampling
    that is a pure function of the input set.

    Salted two-stage top-k (VERDICT r3 item 2 — a plain
    ``Window.partitionBy(host)`` funnels EVERY row of the hottest host into
    one task's sort before truncating):

      stage 1: rank within (host, salt) where salt =
               pmod(xxhash64(url), salt_buckets) — a pure function of the
               row — and keep ``k`` per bucket. The hot host spreads over
               ``salt_buckets`` partitions, each sorting only its share.
      stage 2: rank within host over the ≤ salt_buckets × k survivors and
               keep ``k``.

    The keep-set is IDENTICAL to the single-window form: both stages order
    by the same global (stable_hash(url), url) key, and every row of the
    true per-host top-k is also in its own bucket's top-k, so stage 1 never
    discards a final keeper. Partition sizes stay bounded at any skew:
    stage-1 partitions hold ~rows/salt_buckets of a hot host, stage-2
    partitions hold ≤ salt_buckets × k rows per host."""
    from ocr_model_spark.operators.dedup import stable_hash

    host = url_host(url_col)
    rank_key = [stable_hash(F.col(url_col)), F.col(url_col)]
    salt = F.pmod(F.xxhash64(url_col), F.lit(salt_buckets))
    w1 = Window.partitionBy(host, salt).orderBy(*rank_key)
    pruned = (
        df.withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= k)
        .drop("_rk1")
    )
    w2 = Window.partitionBy(host).orderBy(*rank_key)
    return (
        pruned.withColumn("_rk", F.row_number().over(w2))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
