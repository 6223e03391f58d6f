"""Versioned-manifest snapshot protocol: atomic commits, time travel,
params-fingerprint resume, stray-file invisibility."""

from __future__ import annotations

import os

import pandas as pd

from ocr_model_spark.pipeline import run_versioned
from ocr_model_spark.sources.snapshots import latest_version, read_manifest, read_snapshot


def test_versioned_commit_resume_and_time_travel(spark, pages_path, tmp_path):
    base = str(tmp_path / "vsnap")

    v0 = run_versioned(spark, pages_path, base)
    assert v0 == 0
    assert read_snapshot(spark, base).count() == 300
    # manifest carries the lineage audit rows
    m = read_manifest(base)
    assert sum(r["n_docs"] for r in m["lineage"]) == 300

    # same input, same params → nothing to do, NO new version
    assert run_versioned(spark, pages_path, base) is None
    assert latest_version(base) == 0

    # one recrawled url with changed bytes → delta commit of exactly 1 doc
    pages = pd.read_parquet(pages_path)
    pages.loc[0, "html"] = b"<html><body><p>Recrawled content long enough to extract cleanly.</p></body></html>"
    changed = str(tmp_path / "changed.parquet")
    pages.to_parquet(changed, index=False)
    v1 = run_versioned(spark, changed, base)
    assert v1 == 1
    assert read_snapshot(spark, base).count() == 301
    assert len(read_manifest(base)["delta_files"]) >= 1
    # time travel: v0 still readable and unchanged
    assert read_snapshot(spark, base, version=0).count() == 300

    # stray data file from a crashed writer is invisible to readers
    stray_dir = os.path.join(base, "data", "deadbeef")
    pages.head(5)[["url"]].assign(junk=1).to_parquet(
        os.path.join(os.makedirs(stray_dir, exist_ok=True) or stray_dir, "junk.parquet")
    )
    assert read_snapshot(spark, base).count() == 301

    # changed extraction params → full reprocess (new fingerprint)
    v2 = run_versioned(spark, pages_path, base, params={"profile": "quality"})
    assert v2 == 2
    snap = read_snapshot(spark, base)
    assert snap.count() == 601  # 301 old + 300 reprocessed under new params
    assert snap.select("params_fingerprint").distinct().count() == 2
