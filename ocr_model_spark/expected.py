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
