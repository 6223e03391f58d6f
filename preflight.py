"""Driver-gate preflight: run every queries() entry at sf0.01; compare
SQL-oracled ones against DuckDB like the driver does."""
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import __spark_entry__ as e
from ocr_model_spark.session import get_spark

SF = os.environ.get("PREFLIGHT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
spark = get_spark(app_name="preflight", master="local[16]", shuffle_partitions=16)
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s): df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s): df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s): df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s): df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object and s.notna().any() and not isinstance(s.dropna().iloc[0], str):
            try: df[c] = pd.to_datetime(s)
            except (ValueError, TypeError): pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

qs, oracles = e.queries(), e.oracle_sql()
only = [s for s in os.environ.get("PREFLIGHT_ONLY", "").split(",") if s]
if only:
    qs = {k: v for k, v in qs.items() if k in only}
bad = []
for name, fn in qs.items():
    try:
        got = fn(spark, SF).toPandas()
        if name in oracles:
            want = con.execute(oracles[name]).df()
            g, w = norm(got), norm(want)
            ok = list(g.columns) == list(w.columns) and len(g) == len(w)
            if ok:
                try:
                    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=True)
                    # dtype kinds
                    kinds_ok = all(
                        (pd.api.types.is_integer_dtype(g[c]) == pd.api.types.is_integer_dtype(w[c])) and
                        (pd.api.types.is_float_dtype(g[c]) == pd.api.types.is_float_dtype(w[c]))
                        for c in g.columns)
                    status = "GREEN" if kinds_ok else "KIND-MISMATCH"
                except AssertionError as ex:
                    status = "VALUE-MISMATCH"
            else:
                status = f"SHAPE rows {len(g)}/{len(w)} cols {list(g.columns)}/{list(w.columns)}"
        else:
            status = f"rows-only {len(got)}"
        print(f"{name:28s} {status}")
        if "GREEN" not in status and "rows-only" not in status:
            bad.append(name)
    except Exception as ex:
        print(f"{name:28s} ERROR {type(ex).__name__}: {str(ex)[:120]}")
        bad.append(name)
print("\nBAD:", bad)
