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
  * parquet  — the canonical snapshot format (always available).

Excel (K3) / XML (K4) / annotated-PDF (K5) are non-goals at 10^12 rows
(SURVEY.md §2.1); the JSON/CSV paths carry the same information.
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
