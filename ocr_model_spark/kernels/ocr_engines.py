"""OCR engine wrappers (M1/M2) — import-gated like the reference.

Reference: ``models/ocr_models.py:39-152`` wraps pytesseract
(``image_to_data`` word boxes + confidences) and PaddleOCR (quad boxes +
(text, score) pairs) behind availability checks (``advanced_ocr.py:39-52``);
``worker/model_manager.py`` ensembles their token lists.

Neither engine ships in this container, so both wrappers raise a typed
:class:`OcrEngineUnavailable` unless the import succeeds — the pipeline
counts the failure in lineage, identical to the reference's degradation.
The adapters are still REAL code: fake-module tests drive the exact
output-mapping logic (TSV-dict → tokens, quad-box → bbox), so if the libs
appear the path is already covered.

Token schema (shared with the PDF/HTML kernels' region geometry and the
ensemble merge operator ``operators/tokens.py``):
``{text, x1, y1, x2, y2, confidence, engine}`` — top-left pixel coords,
confidence in [0, 1].
"""

from __future__ import annotations

try:  # pragma: no cover - not installed in this container
    import pytesseract  # type: ignore

    _HAS_TESSERACT = True
except Exception:  # pragma: no cover
    pytesseract = None
    _HAS_TESSERACT = False

try:  # pragma: no cover - not installed in this container
    from paddleocr import PaddleOCR  # type: ignore

    _HAS_PADDLE = True
except Exception:  # pragma: no cover
    PaddleOCR = None
    _HAS_PADDLE = False

_paddle_singleton = None


class OcrEngineUnavailable(RuntimeError):
    """No OCR engine in this build (reference: ``advanced_ocr.py:39-52``)."""


def _tesseract_data_to_tokens(data: dict) -> list[dict]:
    """pytesseract ``image_to_data(Output.DICT)`` → token list: skip blank
    text and the -1 confidences of non-word rows (reference
    ``ocr_models.py:74-90``); confidence rescaled 0-100 → 0-1."""
    tokens: list[dict] = []
    n = len(data.get("text", []))
    for i in range(n):
        text = (data["text"][i] or "").strip()
        conf = float(data["conf"][i])
        if not text or conf < 0:
            continue
        x, y = float(data["left"][i]), float(data["top"][i])
        w, h = float(data["width"][i]), float(data["height"][i])
        tokens.append(
            {
                "text": text,
                "x1": x,
                "y1": y,
                "x2": x + w,
                "y2": y + h,
                "confidence": round(conf / 100.0, 6),
                "engine": "tesseract",
            }
        )
    return tokens


def _paddle_result_to_tokens(result: list) -> list[dict]:
    """PaddleOCR ``ocr()`` result (list of [quad, (text, score)]) → tokens:
    the quad's bounding box becomes the axis-aligned bbox (reference
    ``ocr_models.py:120-152``)."""
    tokens: list[dict] = []
    for line in result or []:
        for quad, (text, score) in line or []:
            text = (text or "").strip()
            if not text:
                continue
            xs = [p[0] for p in quad]
            ys = [p[1] for p in quad]
            tokens.append(
                {
                    "text": text,
                    "x1": float(min(xs)),
                    "y1": float(min(ys)),
                    "x2": float(max(xs)),
                    "y2": float(max(ys)),
                    "confidence": round(float(score), 6),
                    "engine": "paddle",
                }
            )
    return tokens


def ocr_tokens_tesseract(png: bytes, lang: str = "eng") -> list[dict]:
    """M1: word tokens from a rendered page image via Tesseract."""
    if not _HAS_TESSERACT:
        raise OcrEngineUnavailable("tesseract not installed")
    import io  # pragma: no cover - engine-present path

    from PIL import Image  # pragma: no cover

    with Image.open(io.BytesIO(png)) as im:  # pragma: no cover
        data = pytesseract.image_to_data(
            im, lang=lang, output_type=pytesseract.Output.DICT
        )
    return _tesseract_data_to_tokens(data)  # pragma: no cover


def ocr_tokens_paddle(png: bytes) -> list[dict]:
    """M2: text lines from a rendered page image via PaddleOCR."""
    global _paddle_singleton
    if not _HAS_PADDLE:
        raise OcrEngineUnavailable("paddleocr not installed")
    if _paddle_singleton is None:  # pragma: no cover - engine-present path
        _paddle_singleton = PaddleOCR(use_angle_cls=True, show_log=False)
    import numpy as np  # pragma: no cover
    from PIL import Image  # pragma: no cover
    import io  # pragma: no cover

    with Image.open(io.BytesIO(png)) as im:  # pragma: no cover
        result = _paddle_singleton.ocr(np.asarray(im))
    return _paddle_result_to_tokens(result)  # pragma: no cover


def available_engines() -> list[str]:
    out = []
    if _HAS_TESSERACT:
        out.append("tesseract")  # pragma: no cover
    if _HAS_PADDLE:
        out.append("paddle")  # pragma: no cover
    return out
