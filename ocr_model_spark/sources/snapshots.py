"""Versioned snapshot commits: an Iceberg-shaped protocol over plain parquet.

The real deployment writes through an Iceberg catalog (atomic manifest swap,
snapshot isolation, time travel). The catalog jars are absent in this
sandbox, so this module emulates the PROTOCOL — which is what the north
rule's resume semantics depend on — with the same guarantees:

  * data files are written once under ``data/`` with unique names and never
    mutated;
  * a commit is the atomic rename of a manifest json listing the EXACT data
    files of the new version plus the delta's lineage summary;
  * readers resolve the latest manifest and read only files it lists —
    a crashed/partial write leaves stray data files but never a corrupt
    snapshot (dead files are invisible);
  * every version chains to its parent → time travel (`version=` arg).

Cites: content-hash cache semantics ``worker/storage_manager.py:27-44``,
resume short-circuit ``worker/document_processor.py:170-205``.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_manifests"


def _manifest_path(base: str, version: int) -> str:
    return os.path.join(base, _MANIFEST_DIR, f"v{version:06d}.json")


def latest_version(base: str) -> int | None:
    mdir = os.path.join(base, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return None
    versions = [
        int(f[1:-5]) for f in os.listdir(mdir) if f.startswith("v") and f.endswith(".json")
    ]
    return max(versions) if versions else None


def read_manifest(base: str, version: int | None = None) -> dict | None:
    v = latest_version(base) if version is None else version
    if v is None:
        return None
    with open(_manifest_path(base, v)) as f:
        return json.load(f)


def commit_version(
    docs: DataFrame,
    lineage: DataFrame,
    base: str,
    params_fingerprint: str = "",
) -> int:
    """Write the delta's data files, then atomically publish the manifest.

    Returns the committed version number. The new version lists the parent's
    files PLUS the delta files (append semantics); lineage rows are stored
    inside the manifest (small) for audit without extra reads."""
    delta_dir = os.path.join(base, "data", uuid.uuid4().hex[:12])
    docs.write.mode("error").parquet(delta_dir)
    delta_files = sorted(
        os.path.join(delta_dir, f)
        for f in os.listdir(delta_dir)
        if f.endswith(".parquet")
    )
    lineage_rows = [r.asDict() for r in lineage.collect()]
    for r in lineage_rows:
        for k, v in list(r.items()):
            if hasattr(v, "isoformat"):
                r[k] = v.isoformat()
    parent = latest_version(base)
    parent_files: list[str] = []
    if parent is not None:
        parent_files = read_manifest(base, parent)["files"]
    version = 0 if parent is None else parent + 1
    manifest = {
        "version": version,
        "parent": parent,
        "files": parent_files + delta_files,
        "delta_files": delta_files,
        "params_fingerprint": params_fingerprint,
        "lineage": lineage_rows,
    }
    os.makedirs(os.path.join(base, _MANIFEST_DIR), exist_ok=True)
    tmp = _manifest_path(base, version) + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(base, version))  # THE atomic commit point
    return version


def read_snapshot(
    spark: SparkSession, base: str, version: int | None = None
) -> DataFrame | None:
    """Read a committed version (latest by default). Stray data files from
    crashed writers are invisible — only manifest-listed files load."""
    m = read_manifest(base, version)
    if m is None or not m["files"]:
        return None
    return spark.read.parquet(*m["files"])


def resume_against_snapshot(
    pages: DataFrame,
    spark: SparkSession,
    base: str,
    params_fingerprint: str = "",
) -> DataFrame:
    """Anti-join resume keyed on (url, content_sha256, params_fingerprint):
    re-crawled bytes OR changed extraction params reprocess, committed work
    never does (the reference's cache key includes the param fingerprint,
    ``document_processor.py:172-188``)."""
    snap = read_snapshot(spark, base)
    if snap is None:
        return pages
    done = (
        snap.filter(F.col("params_fingerprint") == params_fingerprint)
        .select("url", "content_sha256")
        .dropDuplicates(["url", "content_sha256"])
    )
    keyed = pages.withColumn("content_sha256", F.sha2(F.col("html"), 256))
    return keyed.join(done, ["url", "content_sha256"], "left_anti").drop("content_sha256")
