"""THE correctness gate (north rule): the Spark pipeline's extracted text and
span offsets are byte-identical, per url, to the single-process reference
kernel run on the same payload bytes."""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_model_spark.kernels.extract import extract_document
from ocr_model_spark.pipeline import run_extraction


@pytest.fixture(scope="module")
def spark_results(spark, pages_path):
    res = run_extraction(spark, pages_path, num_partitions=8)
    docs = (
        res["docs"]
        .select("url", "doc_type", "ok", "error", "text_extracted")
        .toPandas()
        .set_index("url")
        .sort_index()
    )
    rows = res["rows"].select(
        "url", "region_idx", "region_type", "text", "span_start", "span_end", "confidence"
    ).toPandas()
    return docs, rows


@pytest.fixture(scope="module")
def reference_results(pages_path):
    pages = pd.read_parquet(pages_path)
    out = {}
    for _, row in pages.iterrows():
        out[row["url"]] = extract_document(bytes(row["html"]))
    return out


def test_extracted_text_byte_identical_per_url(spark_results, reference_results):
    docs, _ = spark_results
    assert len(docs) == len(reference_results)
    mismatches = [
        url
        for url, ref in reference_results.items()
        if docs.loc[url, "text_extracted"] != ref["text"]
    ]
    assert mismatches == []
    # doc_type and ok flags agree too
    for url, ref in reference_results.items():
        assert docs.loc[url, "doc_type"] == ref["doc_type"]
        assert bool(docs.loc[url, "ok"]) == ref["ok"]


def test_span_offsets_identical_per_url(spark_results, reference_results):
    _, rows = spark_results
    by_url = {url: g.sort_values("region_idx") for url, g in rows.groupby("url")}
    for url, ref in reference_results.items():
        got = by_url.get(url)
        n_ref = len(ref["regions"])
        assert (0 if got is None else len(got)) == n_ref, url
        if n_ref == 0:
            continue
        for (_, srow), rreg in zip(got.iterrows(), ref["regions"]):
            assert srow["text"] == rreg["text"]
            assert srow["span_start"] == rreg["span_start"]
            assert srow["span_end"] == rreg["span_end"]
            assert srow["confidence"] == rreg["confidence"]
            # spans index into the document text exactly
            doc_text = ref["text"]
            assert doc_text[srow["span_start"] : srow["span_end"]] == srow["text"]


def test_rerun_is_byte_identical(spark, pages_path, spark_results):
    """Same input → same bytes, across independent Spark runs (determinism)."""
    docs1, _ = spark_results
    res2 = run_extraction(spark, pages_path, num_partitions=4)  # different layout
    docs2 = (
        res2["docs"]
        .select("url", "text_extracted")
        .toPandas()
        .set_index("url")
        .sort_index()
    )
    assert (docs1["text_extracted"] == docs2["text_extracted"]).all()
