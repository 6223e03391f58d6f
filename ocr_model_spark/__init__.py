"""ocr_model_spark — a PySpark-native document-to-structured-text engine.

A from-scratch reimplementation of the query/data-processing capabilities of
the reference system (Sagexd08/Ocr-Model, "CurioScan") as a pure-DataFrame
Spark program: HTML main-content extraction (text-density / link-density
boilerplate stripping), PDF layout parsing (block/line/span reconstruction),
token/region/table analytics, confidence tagging, provenance rows, summary
aggregations, content-hash resume, and per-partition lineage — plus the
large-scale training-data operators (dedup, similarity search, text quality)
a 10^12-row Common-Crawl-style corpus needs.

Design rules (see SURVEY.md):
  * DataFrame/SQL everywhere; Catalyst plans the physical execution.
  * Per-document Python runs ONLY inside vectorized pandas/Arrow UDFs
    (the extraction kernels in ``ocr_model_spark.kernels``).
  * All ids/timestamps are deterministic (sha2 / input warc_ts) — the
    byte-identity contract bans uuid4/now() in the data path.
"""

__version__ = "0.1.0"
