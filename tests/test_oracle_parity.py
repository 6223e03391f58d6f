"""Mimics the driver's correctness gate: run every SQL-oracled query on Spark
AND DuckDB at sf0.001 and compare values exactly (order-insensitive)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_model_spark.queries import SQL_QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif s.dtype == object and len(s) and not isinstance(s.iloc[0], str):
            try:
                df[c] = pd.to_datetime(s)
            except (ValueError, TypeError):
                pass
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", list(SQL_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn, sql = SQL_QUERIES[name]
    got = _normalize(fn(spark, SF_DIR).toPandas())
    want = _normalize(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)
