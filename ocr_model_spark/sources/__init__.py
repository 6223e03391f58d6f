"""Sources: the pages-table schema, the deterministic synthetic corpus
generator, and parquet read helpers."""

from ocr_model_spark.sources.pages import PAGES_SCHEMA, read_pages
from ocr_model_spark.sources.synth import build_pages_pandas, materialize_pages

__all__ = ["PAGES_SCHEMA", "read_pages", "build_pages_pandas", "materialize_pages"]
