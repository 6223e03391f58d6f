"""Export sinks (SURVEY.md §2.1 K1/K2/K6 re-expressed as DataFrame writers).

The reference writes one file per document from a nested dict
(``worker/pipeline/processors/exporter.py:62-548``); at corpus scale the
equivalents are partitioned table writes:

  * K1 JSON  — nested per-document JSON lines (regions inlined);
  * K2 CSV   — the flat Row model, header included;
  * K6 TXT   — structure-preserving text: ``#``-prefixed headings,
    ``- `` list items, regions in reading order joined with blank lines
    (mirrors ``_export_txt``'s markdown-ish rendering,
    ``document_processor.py:1044-1112``);
  * parquet  — the canonical snapshot format (always available);
  * K4 XML   — per-document XML rendering (``exporter.py:232-298`` field
    layout) as a distributed grouped-map stage, written like TXT;
  * K3 XLSX  — SMALL-EXTRACT workbook writer (``exporter.py:300-367``):
    one driver-side .xlsx from a capped extract, stdlib zip+XML (the
    container ships no openpyxl). Deliberately capped — a spreadsheet is a
    human artifact, not a 10^12-row sink; the CSV/parquet paths carry the
    full data.

  * K5 PDF   — SMALL-EXTRACT annotated-PDF sink: a real generated PDF per
    document with stroked token boxes (red = needs review) + labels, via
    the stdlib writer in ``kernels/pdf_write.py``; capped like XLSX —
    review artifacts are for humans, the full data lives in parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_docs_json(docs: DataFrame, out_dir: str) -> None:
    """K1: one JSON object per document, regions nested."""
    docs.write.mode("overwrite").json(out_dir)


def write_rows_csv(rows: DataFrame, out_dir: str) -> None:
    """K2: flat row export with header (complex cols serialized to JSON)."""
    flat = rows.select(
        "row_id",
        "url",
        "page",
        "region_id",
        "region_type",
        "text",
        "span_start",
        "span_end",
        "confidence",
        "needs_review",
        F.to_json("provenance").alias("provenance"),
    )
    flat.write.mode("overwrite").option("header", True).csv(out_dir)


def render_txt(rows: DataFrame) -> DataFrame:
    """K6: per-document structure-preserving text rendering.

    Returns (url, rendered) — pure expression code: prefix by region type,
    collect in reading order, join with blank lines."""
    prefixed = rows.withColumn(
        "_line",
        F.when(F.col("region_type") == "heading", F.concat(F.lit("# "), F.col("text")))
        .when(F.col("region_type") == "list_item", F.concat(F.lit("- "), F.col("text")))
        .when(F.col("region_type") == "quote", F.concat(F.lit("> "), F.col("text")))
        .otherwise(F.col("text")),
    )
    return prefixed.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("region_idx", "_line"))),
                lambda x: x["_line"],
            ),
            "\n\n",
        ).alias("rendered")
    )


def render_ascii_tables(cells: DataFrame) -> DataFrame:
    """Reference TXT-export table rendering (``document_processor.py:
    1085-1103``): per table, column widths = max cell width per column,
    cells left-justified and ``|``-joined, one line per row.

    Pure expression/window code: widths via a max window over (table, col),
    padding via rpad, assembly via ordered collect."""
    w_col = Window.partitionBy("url", "page_num", "region_id", "col_idx")
    padded = cells.withColumn(
        "_w", F.max(F.length("cell_text")).over(w_col)
    ).withColumn("_cell", F.expr("rpad(cell_text, CAST(_w AS INT), ' ')"))
    rows = padded.groupBy("url", "page_num", "region_id", "row_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("col_idx", "_cell"))),
                lambda x: x["_cell"],
            ),
            " | ",
        ).alias("_line")
    )
    return rows.groupBy("url", "page_num", "region_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("row_idx", "_line"))),
                lambda x: x["_line"],
            ),
            "\n",
        ).alias("rendered_table")
    )


def write_docs_txt(rows: DataFrame, out_dir: str) -> None:
    """K6 sink: rendered text, one row per document."""
    render_txt(rows).select(
        F.concat(F.lit("=== "), F.col("url"), F.lit(" ===\n"), F.col("rendered")).alias("value")
    ).write.mode("overwrite").text(out_dir)


# ---------------------------------------------------------------- K4: XML


def render_xml(rows: DataFrame) -> DataFrame:
    """K4: per-document XML (``exporter.py:232-298`` document/regions field
    layout) via grouped-map pandas — stdlib ElementTree handles escaping.
    Returns (url, xml)."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("xml", T.StringType())]
    )

    def one_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        import xml.etree.ElementTree as ET

        pdf = pdf.sort_values("region_idx")
        url = pdf["url"].iloc[0]
        doc = ET.Element("document", url=url)
        regions = ET.SubElement(doc, "regions", count=str(len(pdf)))
        for _, r in pdf.iterrows():
            reg = ET.SubElement(
                regions,
                "region",
                idx=str(int(r["region_idx"])),
                type=str(r["region_type"]),
                span_start=str(int(r["span_start"])),
                span_end=str(int(r["span_end"])),
                confidence=f"{r['confidence']:.6f}",
                needs_review=str(bool(r["needs_review"])).lower(),
            )
            reg.text = str(r["text"])
        return pd.DataFrame(
            [{"url": url, "xml": ET.tostring(doc, encoding="unicode")}]
        )

    cols = [
        "url",
        "region_idx",
        "region_type",
        "text",
        "span_start",
        "span_end",
        "confidence",
        "needs_review",
    ]
    return rows.select(*cols).groupBy("url").applyInPandas(one_doc, schema)


def write_docs_xml(rows: DataFrame, out_dir: str) -> None:
    """K4 sink: one XML document per row, written distributed."""
    render_xml(rows).select(F.col("xml").alias("value")).write.mode("overwrite").text(
        out_dir
    )


# --------------------------------------------------------------- K3: XLSX

XLSX_MAX_ROWS = 10_000  # small-extract cap: spreadsheets are human artifacts


def _xlsx_bytes(headers: list[str], data_rows: list[list]) -> bytes:
    """Minimal valid .xlsx: zip of workbook/worksheet XML with inline
    strings. Stdlib-only, deterministic (fixed zip timestamps)."""
    import xml.etree.ElementTree as ET
    import zipfile
    from io import BytesIO

    def esc(v) -> str:
        from xml.sax.saxutils import escape

        return escape(str(v))

    rows_xml = []
    for ri, row in enumerate([headers] + data_rows, start=1):
        cells = []
        for ci, v in enumerate(row):
            col = ""
            n = ci
            while True:
                col = chr(ord("A") + n % 26) + col
                n = n // 26 - 1
                if n < 0:
                    break
            ref = f"{col}{ri}"
            if ri > 1 and isinstance(v, (int, float)) and not isinstance(v, bool):
                cells.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{esc(v)}</t></is></c>')
        rows_xml.append(f'<row r="{ri}">' + "".join(cells) + "</row>")
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>" + "".join(rows_xml) + "</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="export" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType='
        '"application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, content in (
            ("[Content_Types].xml", content_types),
            ("_rels/.rels", rels),
            ("xl/workbook.xml", workbook),
            ("xl/_rels/workbook.xml.rels", wb_rels),
            ("xl/worksheets/sheet1.xml", sheet),
        ):
            zf.writestr(zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0)), content)
    ET.fromstring(sheet)  # self-check: malformed sheet XML fails the write
    return buf.getvalue()


# ------------------------------------------------------- K5: annotated PDF

ANNOTATE_MAX_DOCS = 50  # small-extract cap: review artifacts are human-sized


def write_annotated_pdfs(
    tokens: DataFrame,
    out_dir: str,
    max_docs: int = ANNOTATE_MAX_DOCS,
    review_threshold: float = 0.7,
    page_size: tuple[float, float] = (612.0, 792.0),
) -> int:
    """K5: one annotated PDF per document from a token frame
    ``(url, page_num, x1, y1, x2, y2, text, confidence)`` — stroked boxes
    (red below the review threshold) + labels, re-readable by the engine's
    own native PDF reader. Raises when the extract exceeds ``max_docs``
    (filter first; this sink is for review extracts). Returns files written.
    """
    import os
    import re as _re

    from ocr_model_spark.kernels.pdf_write import build_annotated_pdf

    urls = [r["url"] for r in tokens.select("url").distinct().limit(max_docs + 1).collect()]
    if len(urls) > max_docs:
        raise ValueError(f"annotated extract exceeds {max_docs} docs; filter or raise max_docs")
    rows = (
        tokens.filter(F.col("url").isin(urls))
        .select("url", "page_num", "x1", "y1", "x2", "y2", "text", "confidence")
        .collect()
    )
    by_doc: dict[str, dict[int, list[dict]]] = {}
    for r in rows:
        by_doc.setdefault(r["url"], {}).setdefault(int(r["page_num"]), []).append(
            {
                "x1": float(r["x1"]),
                "y1": float(r["y1"]),
                "x2": float(r["x2"]),
                "y2": float(r["y2"]),
                "text": r["text"],
                "confidence": float(r["confidence"]),
            }
        )
    os.makedirs(out_dir, exist_ok=True)
    for url in sorted(by_doc):
        pages = [
            {"page_num": pn, "tokens": toks} for pn, toks in sorted(by_doc[url].items())
        ]
        data = build_annotated_pdf(
            pages, page_size[0], page_size[1], review_threshold
        )
        safe = _re.sub(r"[^A-Za-z0-9._-]", "_", url)[:120]
        with open(os.path.join(out_dir, f"{safe}.pdf"), "wb") as f:
            f.write(data)
    return len(by_doc)


def write_rows_xlsx(rows: DataFrame, path: str, max_rows: int = XLSX_MAX_ROWS) -> int:
    """K3 sink: a capped extract as a real .xlsx workbook. Returns the number
    of data rows written; raises if the extract exceeds the cap (the caller
    should filter/limit first — this sink is for human-sized extracts)."""
    cols = rows.columns
    collected = rows.limit(max_rows + 1).collect()
    if len(collected) > max_rows:
        raise ValueError(
            f"xlsx extract exceeds {max_rows} rows; filter or raise max_rows"
        )
    data = [[row[c] for c in cols] for row in collected]
    with open(path, "wb") as f:
        f.write(_xlsx_bytes(list(cols), data))
    return len(data)


# ------------------------------------------- training-data shard export


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    max_records_per_file: int | None = None,
    fmt: str = "json",
) -> dict:
    """Training-data export: JSONL (or parquet, ``fmt='parquet'`` — same
    shard/manifest contract, columnar for table-reading trainers) shards
    plus a deterministic manifest — the OUTPUT stage of a corpus pipeline
    (trainers consume fixed shard lists; reproducibility means the same
    input set must always produce the same shards with the same content).

    Shard assignment is ``pmod(xxhash64(id), n_shards)`` — a pure
    function of the row (house determinism rule: never rand()), so
    re-exports land every document in the same shard and two exports of
    the same set diff clean. Rows sort by id within each shard partition,
    making file CONTENT deterministic, not just membership.

    The manifest records per-shard row counts and an order-free
    ``bit_xor`` fingerprint of the md5-prefix id hashes (xor, not sum —
    sum(long) overflows under ANSI), cheap for a consumer to recompute
    and verify. No wall-clock anywhere (committed-artifact rule).

    Scale shape: ONE hash repartition on the uniform shard key (no skew
    by construction), a bounded ≤ n_shards-row aggregate for the
    manifest; ``max_records_per_file`` caps file sizes for object-store
    friendliness without extra shuffles."""
    import json

    from ocr_model_spark.operators.dedup import stable_hash

    if "shard" in docs.columns:
        raise ValueError(
            "input already has a 'shard' column — rename it; the exporter "
            "writes its own hash-derived shard key"
        )
    sid = F.col(id_col).cast("string")
    sharded = docs.withColumn(
        "shard", F.pmod(F.xxhash64(sid), F.lit(n_shards))
    ).persist()  # ONE input scan feeds both the write and the manifest agg
    try:
        writer = (
            sharded.repartition(n_shards, "shard")
            .sortWithinPartitions("shard", id_col)
            .write.mode("overwrite")
            .partitionBy("shard")
        )
        if max_records_per_file is not None:
            writer = writer.option("maxRecordsPerFile", max_records_per_file)
        if fmt == "json":
            writer.json(out_dir)
        elif fmt == "parquet":
            writer.parquet(out_dir)
        else:
            raise ValueError(f"unsupported shard format: {fmt!r}")
        stats = (
            sharded.withColumn("_h", stable_hash(sid))
            .groupBy("shard")
            .agg(
                F.count("*").alias("n_docs"),
                F.expr("bit_xor(_h)").alias("fingerprint"),
            )
            .collect()  # bounded: <= n_shards rows
        )
    finally:
        sharded.unpersist()
    by_shard = {int(r["shard"]): r for r in stats}
    manifest = {
        "n_shards": n_shards,
        "total_docs": int(sum(r["n_docs"] for r in stats)),
        # TOTAL over range(n_shards): an empty shard records 0 docs /
        # fingerprint 0 instead of silently missing from the fixed list
        "shards": {
            str(s): {
                "n_docs": int(by_shard[s]["n_docs"]) if s in by_shard else 0,
                "fingerprint": int(by_shard[s]["fingerprint"]) if s in by_shard else 0,
            }
            for s in range(n_shards)
        },
    }
    _write_text_file(
        docs.sparkSession,
        out_dir.rstrip("/") + "/_manifest.json",
        json.dumps(manifest, sort_keys=True, indent=2),
    )
    return manifest


def path_exists(spark, path: str) -> bool:
    """Filesystem-aware existence check for driver-side control flow:
    plain os.path for local paths, the JVM Hadoop FileSystem for URI
    schemes — ``os.path.exists('hdfs://…')`` is ALWAYS False, which would
    silently turn an append-to-standing-corpus branch into an overwrite."""
    import os

    if "://" not in path:
        return os.path.exists(path)
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def _write_text_file(spark, path: str, content: str) -> None:
    """Write a small driver-side text file to wherever ``path`` lives:
    plain open() for local paths, the JVM Hadoop FileSystem for URI
    schemes (s3a://, hdfs://, file://) — a local open() against an
    object-store URI would fail only AFTER the expensive distributed
    write succeeded."""
    if "://" not in path:
        with open(path, "w") as f:
            f.write(content)
        return
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
