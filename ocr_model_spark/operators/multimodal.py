"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Driver-mandated training-data plumbing. The Spark side is REAL — schemas,
``mapInPandas`` batch iteration, partition-preserving projection; the decode
kernels are STUBS because no image/audio libraries exist in this container:

  * if PIL is importable, :func:`_decode_image` uses it;
  * otherwise it falls back to a clearly-marked DETERMINISTIC FAKE that
    derives (width, height, format) from the payload's magic bytes + sha256,
    so tests exercise the full distributed path with stable outputs.

At scale the rule from SURVEY.md §1.2 applies: media bytes never survive past
the decode stage as a column — project to features immediately.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except Exception:
    Image = None
    _HAS_PIL = False

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        # sha256 of the UPPERCASE-hex payload encoding: the cross-engine
        # content id (DuckDB 1.0 cannot hash raw BLOBs, only VARCHAR — so
        # the oracle computes sha256(hex(blob)) and we match it here)
        T.StructField("content_fingerprint", T.StringType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _sniff_format(data: bytes) -> str:
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        return "png"
    if data.startswith(b"\xff\xd8\xff"):
        return "jpeg"
    if data.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    return "unknown"


def _decode_image(data: bytes) -> tuple[int, int, str]:
    """Return (width, height, decoder). STUB when PIL is absent: dimensions
    are a deterministic function of the content hash — NOT real pixel data —
    marked by decoder='fake'."""
    if _HAS_PIL:  # pragma: no cover
        import io

        with Image.open(io.BytesIO(data)) as im:
            return im.width, im.height, "pil"
    h = hashlib.sha256(data).digest()
    width = 64 + (h[0] << 4 | h[1] >> 4)  # deterministic fake dims
    height = 64 + (h[2] << 4 | h[3] >> 4)
    return width, height, "fake"


PDF_IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("image_idx", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("colorspace", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
    ]
)


def pdf_embedded_images(pages_df: DataFrame, url_col: str = "url", bin_col: str = "html") -> DataFrame:
    """S11: embedded-image EXPORT as a table (reference exports image files;
    at corpus scale the equivalent is a metadata+hash table — the bytes are
    re-derivable from the source page, so shipping them out of the stage
    would only re-shuffle payloads). Width/height come from the PDF image
    dict — honest, no pixel decode. Callers pre-filter to PDF rows JVM-side
    so only PDFs reach Python."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_model_spark.kernels.pdf_native import extract_embedded_images

        cols = [f.name for f in PDF_IMAGE_SCHEMA.fields]
        for pdf in it:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[bin_col]):
                data = bytes(payload) if payload is not None else b""
                try:
                    imgs = extract_embedded_images(data)
                except Exception:
                    continue  # unparseable pdf: no image rows (lineage covers it)
                for im in imgs:
                    rows.append(
                        {
                            "url": url,
                            "image_idx": im["idx"],
                            "format": im["format"],
                            "width": im["width"],
                            "height": im["height"],
                            "colorspace": im["colorspace"],
                            "n_bytes": im["n_bytes"],
                            "content_sha256": hashlib.sha256(im["data"]).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return pages_df.select(url_col, bin_col).mapInPandas(batches, PDF_IMAGE_SCHEMA)


def image_quality_filter(
    images: DataFrame,
    min_width: int = 64,
    min_height: int = 64,
    max_aspect: float = 10.0,
    min_bytes: int = 32,
) -> DataFrame:
    """P6/P7: pre-OCR image gating (reference skips tiny / degenerate images
    before running models). Pure expressions over honest metadata columns —
    adds ``keep`` plus a ``drop_reason``; downstream OCR stages filter on
    ``keep`` so model kernels never see junk frames."""
    w, h = F.col("width"), F.col("height")
    aspect = F.greatest(w, h) / F.greatest(F.least(w, h), F.lit(1))
    reason = (
        F.when((w < min_width) | (h < min_height), F.lit("too-small"))
        .when(aspect > max_aspect, F.lit("degenerate-aspect"))
        .when(F.col("n_bytes") < min_bytes, F.lit("too-few-bytes"))
        .otherwise(F.lit(None).cast("string"))
    )
    return images.withColumn("drop_reason", reason).withColumn(
        "keep", F.col("drop_reason").isNull()
    )


def media_metadata(media_df: DataFrame, url_col: str = "url", bin_col: str = "html") -> DataFrame:
    """mapInPandas decode stage: (url, binary) → typed media metadata.

    Batch-iterator form so one Python worker handles a whole Arrow batch;
    media bytes are dropped on output (never shuffled)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[bin_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, decoder = _decode_image(data)
                rows.append(
                    {
                        "url": url,
                        "format": _sniff_format(data),
                        "width": w,
                        "height": h,
                        "n_bytes": len(data),
                        "content_sha256": hashlib.sha256(data).hexdigest(),
                        "content_fingerprint": hashlib.sha256(
                            data.hex().upper().encode()
                        ).hexdigest(),
                        "decoder": decoder,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_META_SCHEMA.fields])

    return media_df.select(url_col, bin_col).mapInPandas(decode_batches, MEDIA_META_SCHEMA)
