"""Pinned-output snapshot oracles for the non-SQL-expressible queries.

The extraction/ANN/WARC family cannot be recomputed in ANSI SQL (their
semantics live in the pandas-UDF kernels), but their outputs ARE
deterministic — byte-identity and property tests pin the kernels, and
every float in these outputs is either computed per-row (fixed fold
order) or rounded. So the driver-verifiable oracle is the ``ann_recall``
pattern generalized: a committed snapshot of the full sorted output,
read back by DuckDB with ``read_parquet``. A pin, not a re-derivation —
it converts ANY cross-round drift in kernel output into a visible
CORRECTNESS failure instead of a silently-self-certified "rows > 0".

Snapshots are regenerated EXPLICITLY via ``python -m tools.make_expected``
(after an intentional kernel change) and committed; the pytest parity
suite replays them at sf0.001 so an unintended drift fails locally first.

Rules for snapshot-oracled queries (enforced by :func:`write_snapshot`):
  * no timestamp columns — session-timezone-dependent renderings would
    bake the generating session's zone into the pin (use ``unix_micros``);
  * deterministic total order — every query ends in an ``orderBy`` over a
    unique key, mirrored in the oracle's ``ORDER BY``.
"""

from __future__ import annotations

import os

__all__ = ["expected_dir", "snapshot_path", "snapshot_oracle_sql", "write_snapshot"]


def expected_dir() -> str:
    """Locate the committed ``expected/`` pin directory. When the package
    ships as a ``--py-files`` zip, ``__file__`` points INSIDE the archive
    (not a real directory), so fall through: env override → package-
    relative → the ``__spark_entry__`` module's directory (the driver
    imports it from the repo checkout) → cwd."""
    env = os.environ.get("SPARK_GRAFT_EXPECTED")
    if env:
        return env
    candidates = [
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ]
    import sys

    entry = sys.modules.get("__spark_entry__")
    if entry is not None and getattr(entry, "__file__", None):
        candidates.append(os.path.dirname(os.path.abspath(entry.__file__)))
    candidates.append(os.getcwd())
    for base in candidates:
        d = os.path.join(base, "expected")
        if os.path.isdir(d):
            return d
    return os.path.join(candidates[0], "expected")


def snapshot_path(sf_dir: str, name: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(expected_dir(), tag, f"{name}.parquet")


def snapshot_oracle_sql(name: str, sf_dir: str, order_by: str) -> str:
    return (
        f"SELECT * FROM read_parquet('{snapshot_path(sf_dir, name)}') "
        f"ORDER BY {order_by}"
    )


def write_snapshot(df, sf_dir: str, name: str) -> str:
    """Materialize a Spark DataFrame as the committed expectation file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = df.toPandas()
    for col, dtype in pdf.dtypes.items():
        if "datetime" in str(dtype):
            raise ValueError(
                f"snapshot {name}: column {col} is {dtype} — timestamp columns "
                "are session-timezone-dependent; convert to unix_micros first"
            )
    path = snapshot_path(sf_dir, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path)
    return path


# files whose behavior the snapshot pins depend on: a change to ANY of
# these without re-running tools/make_expected (which refreshes the
# manifest) fails tests/test_snapshot_oracles.py's guard — and a pin file
# edited outside the tool mismatches its recorded hash. Pins and kernels
# can only move TOGETHER, through the tool.
PIN_OWNING_SOURCES = (
    "ocr_model_spark/kernels",  # every kernel file (extract/html/pdf/docx/…)
    "ocr_model_spark/operators/extract.py",
    "ocr_model_spark/operators/dispatch.py",
    "ocr_model_spark/operators/multimodal.py",
    "ocr_model_spark/operators/similarity.py",
    # transitive deps of pinned outputs (review finding): extract_lineage's
    # partition layout goes through salted_repartition → urls.url_host;
    # similarity imports windows.top_k_per_group and dedup._spread/
    # stable_hash — an edit to any of these can shift pinned values
    "ocr_model_spark/operators/urls.py",
    "ocr_model_spark/operators/windows.py",
    "ocr_model_spark/operators/dedup.py",
    "ocr_model_spark/sources/warc.py",
    "ocr_model_spark/sources/synth.py",
    "ocr_model_spark/sources/pages.py",
    "ocr_model_spark/pipeline.py",
    "ocr_model_spark/entry.py",  # the pinned queries' projections live here
)


def _repo_root() -> str:
    return os.path.dirname(expected_dir())


def pin_manifest() -> dict:
    """Recompute {source file: sha256} over PIN_OWNING_SOURCES and
    {pin file: sha256} over expected/ — the manifest committed as
    expected/MANIFEST.json must equal this."""
    import hashlib

    root = _repo_root()

    def file_sha(path: str) -> str:
        with open(path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()

    sources: dict[str, str] = {}
    for entry in PIN_OWNING_SOURCES:
        p = os.path.join(root, entry)
        if os.path.isdir(p):
            for fn in sorted(os.listdir(p)):
                if fn.endswith(".py"):
                    sources[f"{entry}/{fn}"] = file_sha(os.path.join(p, fn))
        elif os.path.isfile(p):
            sources[entry] = file_sha(p)
    pins: dict[str, str] = {}
    exp = expected_dir()
    for tag in sorted(os.listdir(exp)):
        d = os.path.join(exp, tag)
        if not os.path.isdir(d):
            continue
        for fn in sorted(os.listdir(d)):
            if fn.endswith(".parquet"):
                pins[f"{tag}/{fn}"] = file_sha(os.path.join(d, fn))
    return {"sources": sources, "pins": pins}


def write_pin_manifest() -> str:
    import json

    path = os.path.join(expected_dir(), "MANIFEST.json")
    with open(path, "w") as f:
        json.dump(pin_manifest(), f, indent=1, sort_keys=True)
        f.write("\n")
    return path
