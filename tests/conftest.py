from __future__ import annotations

import pandas as pd
import pytest

TESTDATA = "/root/testdata"


@pytest.fixture(scope="session")
def spark():
    from ocr_model_spark.session import get_spark

    s = get_spark(app_name="ocr_model_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def docs_sf0001() -> pd.DataFrame:
    return pd.read_parquet(f"{TESTDATA}/sf0.001/documents.parquet")


@pytest.fixture(scope="session")
def pages_path(docs_sf0001, tmp_path_factory) -> str:
    from ocr_model_spark.sources.synth import materialize_pages

    out = tmp_path_factory.mktemp("pages")
    return materialize_pages(f"{TESTDATA}/sf0.001", str(out), n_pages=300)
