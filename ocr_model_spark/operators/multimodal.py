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


def _header_dims(data: bytes, fmt: str) -> tuple[int, int] | None:
    """Pure-stdlib (width, height) from image CONTAINER HEADERS — no pixel
    decode, no imaging library: PNG IHDR (big-endian u32 pair after the
    8-byte signature + chunk header, first chunk must be IHDR per spec),
    GIF logical-screen descriptor (little-endian u16 pair at offset 6),
    JPEG SOFn marker walk (height then width, big-endian u16, in any
    C0–CF frame marker except DHT/JPG/DAC). Returns None on truncated or
    malformed headers — callers fall back to the marked fake.

    Reference reads dims via PIL (worker/pipeline/processors/
    image_ingestion.py:17-36); at corpus scale header parsing gives the
    same two columns for ~free without shipping pixels anywhere."""
    try:
        if fmt == "png":
            if len(data) < 24 or data[12:16] != b"IHDR":
                return None
            w = int.from_bytes(data[16:20], "big")
            h = int.from_bytes(data[20:24], "big")
            # PNG caps dims at 2^31-1; anything larger is a malformed
            # header AND would overflow the Int32 Arrow schema field
            if w > 0x7FFFFFFF or h > 0x7FFFFFFF:
                return None
            return (w, h) if w and h else None
        if fmt == "gif":
            if len(data) < 10:
                return None
            w = int.from_bytes(data[6:8], "little")
            h = int.from_bytes(data[8:10], "little")
            return (w, h) if w and h else None
        if fmt == "jpeg":
            i, n = 2, len(data)
            while i + 4 <= n:
                if data[i] != 0xFF:
                    return None  # lost marker sync
                marker = data[i + 1]
                if marker == 0xFF:  # fill byte
                    i += 1
                    continue
                # standalone markers carry no length segment
                if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                    i += 2
                    continue
                seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
                if seg_len < 2:
                    return None
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    if i + 9 > n:
                        return None
                    h = int.from_bytes(data[i + 5 : i + 7], "big")
                    w = int.from_bytes(data[i + 7 : i + 9], "big")
                    return (w, h) if w and h else None
                i += 2 + seg_len
            return None
    except Exception:
        return None
    return None


def _decode_image(data: bytes) -> tuple[int, int, str]:
    """Return (width, height, decoder). Priority: stdlib container-header
    parse FIRST (decoder='header' — deterministic and environment-
    independent, so the driver oracle's literal 'header' holds whether or
    not an imaging library is installed) → PIL when importable
    (decoder='pil', wrapped: Image.open raises on truncated/opaque
    payloads) → deterministic content-hash fake (decoder='fake', NOT real
    pixel data) so the distributed path always yields stable, typed
    output."""
    dims = _header_dims(data, _sniff_format(data))
    if dims is not None:
        return dims[0], dims[1], "header"
    if _HAS_PIL:  # pragma: no cover
        import io

        try:
            with Image.open(io.BytesIO(data)) as im:
                return im.width, im.height, "pil"
        except Exception:
            pass
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


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("src_width", T.IntegerType()),
        T.StructField("src_height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized_sha256", T.StringType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def resize_images(
    media_df: DataFrame,
    max_side: int = 256,
    url_col: str = "url",
    bin_col: str = "html",
) -> DataFrame:
    """Image-resize stage plumbing (training pipelines normalize image dims
    before feature extraction). The Spark side is REAL — mapInPandas batch
    iteration, aspect-preserving target-dim arithmetic from the header
    dims, bytes never survive the stage; the PIXEL step is PIL when
    importable, else a deterministic fake (sha256 of content + target
    dims, decoder='fake') so the distributed path stays testable without
    an imaging library. Output dims: longest side clamped to ``max_side``,
    aspect preserved, never upscaled."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[bin_col]):
                data = bytes(payload) if payload is not None else b""
                w, h, decoder = _decode_image(data)
                scale = min(1.0, max_side / max(w, h, 1))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                if _HAS_PIL and decoder != "fake":  # pragma: no cover
                    import io

                    try:
                        with Image.open(io.BytesIO(data)) as im:
                            out = im.resize((ow, oh))
                            buf = io.BytesIO()
                            out.save(buf, format="PNG")
                            digest = hashlib.sha256(buf.getvalue()).hexdigest()
                            decoder = "pil"
                    except Exception:
                        digest = hashlib.sha256(
                            data + f"{ow}x{oh}".encode()
                        ).hexdigest()
                        decoder = "fake"
                else:
                    # deterministic fake: content + target dims (NOT pixels)
                    digest = hashlib.sha256(data + f"{ow}x{oh}".encode()).hexdigest()
                    decoder = "fake" if decoder == "fake" else f"{decoder}+fake-pixels"
                rows.append(
                    {
                        "url": url,
                        "src_width": w,
                        "src_height": h,
                        "out_width": ow,
                        "out_height": oh,
                        "resized_sha256": digest,
                        "decoder": decoder,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZE_SCHEMA.fields])

    return media_df.select(url_col, bin_col).mapInPandas(batches, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame_sha256", T.StringType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def video_frame_sample(
    media_df: DataFrame,
    n_frames: int = 4,
    url_col: str = "url",
    bin_col: str = "html",
) -> DataFrame:
    """Video frame-sampling stage plumbing: one row per sampled frame,
    evenly spaced timestamps. No video decoder exists in this container
    (cv2/ffmpeg absent), so the DECODE is a clearly-marked deterministic
    fake — frame hash = sha256(content ‖ frame index), a notional 10 s
    duration — while the Spark side (schema, mapInPandas batch shape,
    explode-free one-to-many emission, bytes dropped on output) is the
    real plumbing a decoder slots into. The decoder column is 'fake'
    UNCONDITIONALLY: labeling by import-availability would claim 'cv2'
    while still emitting fake hashes (review finding) — the label flips
    only when a real decode path is wired in."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[bin_col]):
                data = bytes(payload) if payload is not None else b""
                duration_ms = 10_000  # fake decoder: notional 10 s clip
                for i in range(n_frames):
                    rows.append(
                        {
                            "url": url,
                            "frame_idx": i,
                            "ts_ms": (duration_ms * i) // max(1, n_frames),
                            "frame_sha256": hashlib.sha256(
                                data + i.to_bytes(4, "big")
                            ).hexdigest(),
                            "decoder": "fake",
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media_df.select(url_col, bin_col).mapInPandas(batches, FRAME_SCHEMA)


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
