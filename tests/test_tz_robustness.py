"""Timestamp queries must match the oracle regardless of the caller's Spark
session timezone (the driver's session config is not ours to control)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_model_spark.entry import EXTRA_SQL_QUERIES
from ocr_model_spark.queries import DEMOTED_SQL_QUERIES, SQL_QUERIES
from tests.test_oracle_parity import TABLES, _normalize

SF_DIR = "/root/testdata/sf0.001"
TZ_SENSITIVE = [
    "user_sessions", "daily_running", "first_events", "event_type_presence",
    "streaming_windowed", "asof_last_purchase", "events_cube", "sliding_window_sum",
]


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_matches_oracle_under_adversarial_session_tz(name, spark):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    fn, sql = {**SQL_QUERIES, **DEMOTED_SQL_QUERIES, **EXTRA_SQL_QUERIES}[name]
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Australia/Eucla")  # +8:45
    try:
        got, got_kinds = _normalize(fn(spark, SF_DIR).toPandas())
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    want, want_kinds = _normalize(con.execute(sql).df())
    assert got_kinds == want_kinds, f"{name}: dtype kinds diverge {got_kinds} vs {want_kinds}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)
