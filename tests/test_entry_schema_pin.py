"""Pin the driver-facing schemas: the driver smoke-checks entry() for a
STABLE schema across rounds — any drift here must be a conscious decision."""

from __future__ import annotations

import __spark_entry__ as e

ENTRY_COLUMNS = [
    "url",
    "warc_ts",
    "lang",
    "doc_type",
    "ok",
    "error",
    "is_encrypted",  # added round 3 (VERDICT r2 #8) — conscious schema change
    "title",
    "content_sha256",
    "char_count",
    "word_count",
    "n_regions",
    "min_confidence",
    "needs_review_count",
    "avg_confidence",
]


def test_entry_schema_is_pinned(spark):
    df = e.entry(spark)
    assert df.columns == ENTRY_COLUMNS
    types = dict(df.dtypes)
    assert types["warc_ts"] == "timestamp"  # PAGES_SCHEMA pins TimestampType
    assert types["char_count"] == "int"
    assert types["avg_confidence"] == "double"
    assert types["needs_review_count"] == "int"


def test_every_query_key_has_stable_callable(spark):
    qs, oracles = e.queries(), e.oracle_sql()
    assert len(qs) == 60
    # round 3: EVERY query is oracled (snapshot pins closed the 8
    # rows-only holes — zero no_oracle rows is the driver-facing contract)
    assert len(oracles) == 60
    assert set(oracles) == set(qs)
    # names are stable identifiers (the driver keys CORRECTNESS on them)
    for name in qs:
        assert name.replace("_", "").isalnum()
