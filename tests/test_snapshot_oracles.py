"""Replay the committed snapshot-oracle pins at sf0.001 — the same compare
the driver runs at sf0.01. An unintended kernel-output drift fails HERE
first; an intended one is regenerated via ``python -m tools.make_expected``
and shows up in the diff of ``expected/`` (a conscious, reviewable change).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_model_spark.entry import SNAPSHOT_QUERIES
from ocr_model_spark.expected import snapshot_oracle_sql

SF_DIR = "/root/testdata/sf0.001"


def _normalize(df: pd.DataFrame):
    df = df[sorted(df.columns)].copy()
    kinds = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
            kinds[c] = "bool"
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
            kinds[c] = "int"
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
            kinds[c] = "float"
        else:
            kinds[c] = "object"
    return df.sort_values(by=list(df.columns)).reset_index(drop=True), kinds


@pytest.mark.parametrize("name", list(SNAPSHOT_QUERIES))
def test_snapshot_pin_matches_engine_output(name, spark):
    fn, order_by = SNAPSHOT_QUERIES[name]
    got, got_kinds = _normalize(fn(spark, SF_DIR).toPandas())
    want, want_kinds = _normalize(
        duckdb.connect().execute(snapshot_oracle_sql(name, SF_DIR, order_by)).df()
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    )
    assert got_kinds == want_kinds, f"{name}: {got_kinds} vs {want_kinds}"
    assert len(got) == len(want) and len(got) > 0, f"{name}: rows {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)


def test_no_timestamp_columns_in_snapshot_queries(spark):
    """Session-timezone-dependence guard: the pins must carry instants as
    unix_micros, never as rendered timestamps."""
    for name, (fn, _order) in SNAPSHOT_QUERIES.items():
        dtypes = dict(fn(spark, SF_DIR).dtypes)
        bad = {c: t for c, t in dtypes.items() if "timestamp" in t or "date" in t}
        assert not bad, f"{name}: timestamp-typed columns {bad}"


def test_encrypted_pdfs_are_counted(spark):
    """GEN_VERSION 6 synthesizes /Encrypt PDFs; doc_summary surfaces them
    (VERDICT r2 #8). At sf0.01 the corpus must contain some."""
    from ocr_model_spark.entry import q_extract_doc_summary

    df = q_extract_doc_summary(spark, "/root/testdata/sf0.01")
    enc = df.filter("is_encrypted").count()
    assert enc > 0
    # encrypted rows are failed, typed, and sniffed as pdf
    bad = df.filter("is_encrypted AND (ok OR error != 'pdf-encrypted' OR doc_type != 'pdf')")
    assert bad.count() == 0


def test_pin_manifest_guards_drift():
    """expected/MANIFEST.json keys every pin file AND every pin-owning
    source file to its sha256 at regeneration time. A kernel edit without
    re-running tools/make_expected, or a pin file changed outside the tool,
    fails here — drift cannot land silently (VERDICT r3 item 10)."""
    import json
    import os

    from ocr_model_spark.expected import expected_dir, pin_manifest

    path = os.path.join(expected_dir(), "MANIFEST.json")
    assert os.path.isfile(path), "run: python -m tools.make_expected"
    committed = json.load(open(path))
    current = pin_manifest()
    stale_sources = [
        k
        for k in set(committed["sources"]) | set(current["sources"])
        if committed["sources"].get(k) != current["sources"].get(k)
    ]
    assert not stale_sources, (
        f"pin-owning sources changed without regenerating pins: {stale_sources}"
        " — run python -m tools.make_expected and commit expected/"
    )
    stale_pins = [
        k
        for k in set(committed["pins"]) | set(current["pins"])
        if committed["pins"].get(k) != current["pins"].get(k)
    ]
    assert not stale_pins, f"pin files drifted outside the tool: {stale_pins}"
