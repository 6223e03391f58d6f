"""Mimics the driver's correctness gate: run every SQL-oracled query on Spark
AND DuckDB at sf0.001 and compare values exactly (order-insensitive)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from ocr_model_spark.queries import DEMOTED_SQL_QUERIES, SQL_QUERIES

# demoted queries left the driver's 50-slot window but keep FULL oracle
# parity here — the suite is their correctness gate now
ALL_SQL_QUERIES = {**SQL_QUERIES, **DEMOTED_SQL_QUERIES}

SF_DIR = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame):
    """Returns (normalized_df, per-column type-kind map).

    The kind map is compared strictly between Spark and DuckDB: a DuckDB
    HUGEINT (arriving as float64/object) vs a Spark BIGINT must FAIL here,
    because the driver's value-hash gate sees them as different — the oracle
    SQL must CAST integer SUMs to BIGINT (CORRECTNESS_r01 regression)."""
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
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).dt.tz_localize(None)
            kinds[c] = "datetime"
        elif s.dtype == object and len(s) and not isinstance(s.iloc[0], str):
            try:
                df[c] = pd.to_datetime(s)
                kinds[c] = "datetime"
            except (ValueError, TypeError):
                kinds[c] = "object"
        else:
            kinds[c] = "object"
    return df.sort_values(by=list(df.columns)).reset_index(drop=True), kinds


@pytest.mark.parametrize("name", list(ALL_SQL_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    fn, sql = ALL_SQL_QUERIES[name]
    got, got_kinds = _normalize(fn(spark, SF_DIR).toPandas())
    want, want_kinds = _normalize(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), f"{name}: columns {list(got.columns)} vs {list(want.columns)}"
    assert got_kinds == want_kinds, f"{name}: dtype kinds diverge {got_kinds} vs {want_kinds}"
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True, obj=name)


def test_multimodal_media_meta_matches_oracle(spark, duck):
    """The mapInPandas decode path vs the DuckDB hex-based oracle — the
    driver runs this exact pair at its correctness sf."""
    from ocr_model_spark.entry import multimodal_oracle_sql, q_multimodal_media_meta

    got, got_kinds = _normalize(q_multimodal_media_meta(spark, SF_DIR).toPandas())
    want, want_kinds = _normalize(duck.execute(multimodal_oracle_sql(SF_DIR)).df())
    assert list(got.columns) == list(want.columns)
    assert got_kinds == want_kinds
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_ann_recall_matches_pinned_oracle(spark, duck):
    """Recall@3 of both ANN paths, verified against the pinned oracle — a
    regression gate on ANN quality (the values are deterministic)."""
    from ocr_model_spark.entry import ann_recall_oracle_sql, q_ann_recall

    got, got_kinds = _normalize(q_ann_recall(spark, SF_DIR).toPandas())
    want, want_kinds = _normalize(duck.execute(ann_recall_oracle_sql(SF_DIR)).df())
    assert got_kinds == want_kinds
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert (got["recall_at_3"] >= 0.5).all()  # floor: ANN must stay useful


def test_streaming_dedup_matches_oracle(spark, duck):
    """Stateful streaming dropDuplicates vs the batch COUNT(DISTINCT) oracle."""
    from ocr_model_spark.entry import _SQL_STREAMING_DEDUP, q_streaming_dedup

    got, got_kinds = _normalize(q_streaming_dedup(spark, SF_DIR).toPandas())
    want, want_kinds = _normalize(duck.execute(_SQL_STREAMING_DEDUP).df())
    assert got_kinds == want_kinds
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_host_counters_matches_oracle(spark, duck):
    """Both per-host counter implementations (applyInPandasWithState
    streaming + salted two-stage batch) vs the method-tagged batch oracle
    over the same pages parquet — the merged single-slot driver query."""
    from ocr_model_spark.entry import host_counters_oracle_sql, q_host_counters

    got, got_kinds = _normalize(q_host_counters(spark, SF_DIR).toPandas())
    want, want_kinds = _normalize(duck.execute(host_counters_oracle_sql(SF_DIR)).df())
    assert got_kinds == want_kinds
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


def test_minhash_kernel_twin_matches_expression_pipeline(spark):
    """The pure-Python signature kernel (streaming path) must equal the
    distributed expression pipeline exactly, doc by doc."""
    import pandas as pd

    from ocr_model_spark.kernels.minhash import minhash_signature
    from ocr_model_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sigs = minhash_signatures(docs, "doc_id", "text").toPandas().set_index("id")
    texts = pd.read_parquet(f"{SF_DIR}/documents.parquet").set_index("doc_id")["text"]
    assert len(sigs) == len(texts)
    for doc_id, row in sigs.iterrows():
        expected = minhash_signature(texts.loc[doc_id])
        got = [int(row[f"mh{i}"]) for i in range(16)]
        assert got == expected, doc_id


def test_streaming_near_dup_matches_oracle(spark, duck):
    """Stateful streaming LSH banding vs the batch smaller-id-bucket-mate
    oracle: identical flag sets."""
    from ocr_model_spark.entry import _streaming_near_dup_sql, q_streaming_near_dup

    got, got_kinds = _normalize(q_streaming_near_dup(spark, SF_DIR).toPandas())
    want, want_kinds = _normalize(duck.execute(_streaming_near_dup_sql()).df())
    assert got_kinds == want_kinds
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert got["is_near_dup"].any()  # the corpus does contain near-dups


def test_host_cap_sample_matches_oracle(spark, duck):
    """Deterministic per-host capping vs the DuckDB re-ranking oracle —
    the kept-set fingerprint pins WHICH rows survive."""
    from ocr_model_spark.entry import host_cap_oracle_sql, q_host_cap_sample

    got, got_kinds = _normalize(q_host_cap_sample(spark, SF_DIR).toPandas())
    want, want_kinds = _normalize(duck.execute(host_cap_oracle_sql(SF_DIR)).df())
    assert got_kinds == want_kinds
    assert len(got) == len(want) and len(got) > 0
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
    assert (got["n_kept"] <= 5).all()
