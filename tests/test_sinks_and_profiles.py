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


def test_xml_sink_well_formed_and_complete(spark, extraction, tmp_path):
    import xml.etree.ElementTree as ET

    from ocr_model_spark.sources.sinks import render_xml, write_docs_xml

    xml_df = render_xml(extraction["rows"]).toPandas()
    assert len(xml_df) == extraction["rows"].select("url").distinct().count()
    total_regions = 0
    for _, row in xml_df.iterrows():
        doc = ET.fromstring(row["xml"])  # raises on malformed output
        assert doc.tag == "document" and doc.get("url") == row["url"]
        regions = doc.find("regions")
        kids = list(regions)
        assert int(regions.get("count")) == len(kids)
        total_regions += len(kids)
        for reg in kids:
            assert reg.get("type") and reg.get("span_start") is not None
    assert total_regions == extraction["rows"].count()

    write_docs_xml(extraction["rows"], str(tmp_path / "xml"))
    back = spark.read.text(str(tmp_path / "xml"))
    assert back.count() == len(xml_df)


def test_xlsx_sink_roundtrip(spark, extraction, tmp_path):
    import zipfile
    import xml.etree.ElementTree as ET

    from ocr_model_spark.sources.sinks import write_rows_xlsx

    flat = extraction["rows"].select(
        "url", "region_type", "text", "span_start", "confidence"
    ).orderBy("url", "span_start").limit(50)
    path = str(tmp_path / "extract.xlsx")
    n = write_rows_xlsx(flat, path)
    assert n == 50
    ns = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml", "xl/worksheets/sheet1.xml"} <= names
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    rows = sheet.findall(f"{ns}sheetData/{ns}row")
    assert len(rows) == 51  # header + 50
    header = [t.text for t in rows[0].iter(f"{ns}t")]
    assert header == ["url", "region_type", "text", "span_start", "confidence"]
    # numeric cells survive as numbers
    first_data = rows[1]
    vals = [c.findtext(f"{ns}v") for c in first_data.findall(f"{ns}c")]
    assert any(v is not None for v in vals)


def test_xlsx_sink_enforces_small_extract_cap(spark, extraction, tmp_path):
    import pytest as _pytest

    from ocr_model_spark.sources.sinks import write_rows_xlsx

    with _pytest.raises(ValueError, match="exceeds"):
        write_rows_xlsx(
            extraction["rows"], str(tmp_path / "too_big.xlsx"), max_rows=10
        )


def test_annotated_pdf_sink_roundtrips_through_native_reader(spark, tmp_path):
    """K5: the annotated PDFs are REAL PDFs — the engine's own stdlib reader
    re-reads the token labels; box ops are present per token."""
    import glob as _glob
    import os

    from ocr_model_spark.kernels.pdf_extract import _group_blocks
    from ocr_model_spark.kernels.pdf_native import extract_pages_native
    from ocr_model_spark.queries import derived_tokens
    from ocr_model_spark.sources.sinks import write_annotated_pdfs

    toks = derived_tokens(spark, "/root/testdata/sf0.001").filter(
        F.col("url").isin("doc0", "doc1")
    )
    n = write_annotated_pdfs(toks, str(tmp_path / "annot"))
    assert n == 2
    files = sorted(_glob.glob(str(tmp_path / "annot" / "*.pdf")))
    assert len(files) == 2
    with open(files[0], "rb") as f:
        data = f.read()
    assert data.startswith(b"%PDF")
    n_tokens = toks.filter(F.col("url") == "doc0").count()
    assert data.count(b" re S Q") == n_tokens  # one stroked box per token
    pages = extract_pages_native(data, _group_blocks)
    assert len(pages) == toks.filter(F.col("url") == "doc0").select("page_num").distinct().count()
    page_text = " ".join(b["text"] for p in pages for b in p["blocks"])
    assert "view" in page_text or "click" in page_text  # event-type labels survive
    # determinism: same tokens → identical bytes
    write_annotated_pdfs(toks, str(tmp_path / "annot2"))
    with open(sorted(_glob.glob(str(tmp_path / "annot2" / "*.pdf")))[0], "rb") as f:
        assert f.read() == data


def test_annotated_pdf_sink_enforces_cap(spark, tmp_path):
    import pytest as _pytest

    from ocr_model_spark.queries import derived_tokens
    from ocr_model_spark.sources.sinks import write_annotated_pdfs

    toks = derived_tokens(spark, "/root/testdata/sf0.001")
    with _pytest.raises(ValueError, match="exceeds"):
        write_annotated_pdfs(toks, str(tmp_path / "x"), max_docs=3)


def test_training_shard_export_deterministic(spark, tmp_path):
    """The shard export is a pure function of the input set: same docs →
    identical manifest twice; shard membership is the xxhash64 rule;
    counts sum to the corpus; the JSONL roundtrip recovers every doc id
    in its assigned shard."""
    import json

    from ocr_model_spark.sources.sinks import write_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_training_shards(docs, out1, n_shards=8)
    m2 = write_training_shards(docs, out2, n_shards=8)
    assert m1 == m2  # determinism across runs
    assert m1["total_docs"] == docs.count()
    assert sum(s["n_docs"] for s in m1["shards"].values()) == m1["total_docs"]
    with open(f"{out1}/_manifest.json") as f:
        assert json.load(f) == m1

    back = spark.read.json(out1)
    assert back.count() == m1["total_docs"]
    # membership: every row sits in its xxhash64 shard
    bad = back.filter(
        F.col("shard")
        != F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(8))
    ).count()
    assert bad == 0
    # file content determinism: same bytes for the same shard across runs
    import glob as g
    import hashlib

    def shard_digest(out, shard):
        parts = sorted(g.glob(f"{out}/shard={shard}/part-*"))
        h = hashlib.md5()
        for p in parts:
            with open(p, "rb") as fh:
                h.update(fh.read())
        return h.hexdigest()

    for s in m1["shards"]:
        assert shard_digest(out1, s) == shard_digest(out2, s)


def test_training_shard_export_parquet_format(spark, tmp_path):
    """fmt='parquet' keeps the shard/manifest contract: same membership
    and manifest as the JSONL export of the same set, columnar roundtrip,
    unknown formats rejected."""
    import pytest

    from ocr_model_spark.sources.sinks import write_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    mj = write_training_shards(docs, str(tmp_path / "j"), n_shards=8)
    mp = write_training_shards(docs, str(tmp_path / "p"), n_shards=8, fmt="parquet")
    assert mp == mj  # identical membership → identical manifest
    back = spark.read.parquet(str(tmp_path / "p"))
    assert back.count() == mp["total_docs"]
    assert set(back.columns) >= {"doc_id", "text", "shard"}
    with pytest.raises(ValueError, match="unsupported shard format"):
        write_training_shards(docs, str(tmp_path / "x"), fmt="csv")
