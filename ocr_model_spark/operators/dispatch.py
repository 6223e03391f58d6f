"""Document-type dispatch as pure column expressions + the gated-UDF combinator.

Reference semantics: magic-byte sniffing (``worker/pipeline/io_conversion.py:
14-26``) and the scanned-vs-native dispatch that runs expensive kernels only
on the rows that need them (``pdf_processor.py:199-226``,
``document_processor.py:321-330``). Catalyst cannot gate an opaque UDF on a
predicate by itself, so the split/apply/union combinator below is the one
custom physical strategy the engine encodes (SURVEY.md §4).

The sniff here is JVM-side (whole-stage codegen'd ``when`` chain over binary
prefixes) — zero Python dispatch, matching the north rule. It must agree with
the Python twin :func:`ocr_model_spark.kernels.sniff.sniff_doc_type`; a test
pins the two to each other.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ocr_model_spark.kernels import sniff


def _startswith(col: Column, prefix: bytes) -> Column:
    return F.substring(col, 1, len(prefix)) == F.lit(prefix)


def doc_type_col(html: Column) -> Column:
    """Pure-expression doc-type sniff over a BINARY column.

    Mirrors kernels/sniff.py exactly: PDF/PNG/JPEG/GIF/zip magic first, then
    an HTML-looking scan over the (lowercased, left-trimmed) first bytes.
    """
    # match kernels/sniff.py exactly: 512-byte window, strip ALL leading
    # whitespace (Spark ltrim strips only spaces — '\n<div>' would mis-sniff
    # as text), then the first 256 chars lowercased
    head = F.decode(F.substring(html, 1, 512), "ISO-8859-1")
    low = F.lower(F.substring(F.regexp_replace(head, r"^\s+", ""), 1, 256))
    return (
        F.when(html.isNull() | (F.length(html) == 0), F.lit("unknown"))
        .when(_startswith(html, b"%PDF"), F.lit("pdf"))
        .when(_startswith(html, b"\x89PNG\r\n\x1a\n"), F.lit("image"))
        .when(_startswith(html, b"\xff\xd8\xff"), F.lit("image"))
        .when(_startswith(html, b"GIF87a") | _startswith(html, b"GIF89a"), F.lit("image"))
        .when(_startswith(html, b"PK\x03\x04"), F.lit("docx"))
        .when(
            _startswith(html, b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"),
            # whole-payload scans for UTF-16LE directory-entry markers
            # (binary contains, JVM-side) route the extractable legacy-
            # Office children; priority mirrors kernels/sniff.py and
            # extract_ole's stream probing. Unknown CFB = typed failure.
            F.when(
                F.contains(html, F.lit(sniff.WORD_STREAM_MARKER)), F.lit("doc")
            )
            .when(
                F.contains(html, F.lit(sniff.XLS_STREAM_MARKERS[0]))
                | F.contains(html, F.lit(sniff.XLS_STREAM_MARKERS[1])),
                F.lit("xls"),
            )
            .when(F.contains(html, F.lit(sniff.PPT_STREAM_MARKER)), F.lit("ppt"))
            .otherwise(F.lit("ole")),
        )
        .when(
            low.startswith("<!doctype html")
            | low.startswith("<html")
            | low.contains("<html"),
            F.lit("html"),
        )
        .when(low.startswith("<") & low.contains(">"), F.lit("html"))
        .otherwise(F.lit("text"))
    )


def gated_transform(
    df: DataFrame,
    predicate: Column,
    expensive: Callable[[DataFrame], DataFrame],
    cheap: Callable[[DataFrame], DataFrame],
) -> DataFrame:
    """Run ``expensive`` (typically a pandas-UDF stage) only on rows matching
    ``predicate``; run ``cheap`` (pure expressions) on the rest; union back.

    Both callables must produce union-compatible schemas (checked by
    ``unionByName``). This is the reference's native-vs-scanned gate
    re-expressed for Spark: the predicate evaluates JVM-side, so the Python
    worker never sees the rows that don't need it.
    """
    hot = expensive(df.filter(predicate))
    cold = cheap(df.filter(~predicate | predicate.isNull()))
    return hot.unionByName(cold, allowMissingColumns=True)
