"""Sinks (K1/K2/K6) and the config-driven profile builder."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import functions as F

from ocr_model_spark.pipeline import run_extraction
from ocr_model_spark.plans import PROFILES, build_pipeline
from ocr_model_spark.sources.sinks import render_txt, write_docs_json, write_rows_csv, write_docs_txt


@pytest.fixture(scope="module")
def extraction(spark, pages_path):
    return run_extraction(spark, pages_path, num_partitions=8)


def test_json_and_csv_sinks_roundtrip(spark, extraction, tmp_path):
    write_docs_json(extraction["docs"], str(tmp_path / "json"))
    back = spark.read.json(str(tmp_path / "json"))
    assert back.count() == 300
    assert "regions" in back.columns

    write_rows_csv(extraction["rows"], str(tmp_path / "csv"))
    files = glob.glob(str(tmp_path / "csv" / "*.csv"))
    assert files
    back = spark.read.option("header", True).csv(str(tmp_path / "csv"))
    assert back.count() == extraction["rows"].count()
    assert "span_start" in back.columns


def test_txt_rendering_structure(spark, extraction, tmp_path):
    rendered = render_txt(extraction["rows"])
    one = (
        rendered.join(
            extraction["rows"].filter(F.col("region_type") == "heading").select("url").distinct(),
            "url",
        )
        .first()
    )
    assert "# " in one["rendered"]
    write_docs_txt(extraction["rows"], str(tmp_path / "txt"))
    assert glob.glob(str(tmp_path / "txt" / "part-*"))


def test_profiles_compose_lazily(spark, pages_path):
    pages = spark.read.parquet(pages_path)
    for profile in PROFILES:
        out = build_pipeline(profile)(pages)  # no action: must build instantly
        assert out.columns
    perf = build_pipeline("performance")(pages)
    assert "word_count" in perf.columns
    qual = build_pipeline("quality")(pages)
    assert "quality_bucket" in qual.columns
    with pytest.raises(KeyError):
        build_pipeline("default", ["nonexistent_stage"])


def test_ascii_table_rendering(spark):
    from ocr_model_spark.operators.tables_grouped import reconstruct_tables
    from ocr_model_spark.sources.sinks import render_ascii_tables

    rows = []
    grid = {(0, 0): "a", (0, 1): "long cell", (1, 0): "bb", (1, 1): "c"}
    idx = 0
    for (r, c), txt in grid.items():
        rows.append(("u", 1, "t", idx, txt, 50.0 + 200 * c, 100.0 + 40 * r,
                     60.0 + 200 * c, 112.0 + 40 * r, 0.9))
        idx += 1
    tokens = spark.createDataFrame(
        rows,
        "url string, page_num int, region_id string, token_idx int, text string, "
        "x1 double, y1 double, x2 double, y2 double, confidence double",
    )
    out = render_ascii_tables(reconstruct_tables(tokens)).first()
    lines = out["rendered_table"].split("\n")
    # ljust to the widest cell per column, '|'-joined (reference TXT export)
    assert lines == ["a  | long cell", "bb | c        "]
