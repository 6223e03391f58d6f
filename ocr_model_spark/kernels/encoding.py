"""Byte→str decoding with the reference's exact encoding-fallback chain.

Reference semantics: ``worker/document_processor.py:513-549`` — try UTF-8
strictly, then ``latin-1``, ``cp1252``, ``iso-8859-1`` in that order; raise if
all fail. (``latin-1`` maps every byte, so in practice the chain terminates at
the second step; we preserve the published order anyway because the decoded
text — and therefore every span offset downstream — depends on it.)
"""

from __future__ import annotations

_FALLBACK_CHAIN: tuple[str, ...] = ("utf-8", "latin-1", "cp1252", "iso-8859-1")


def decode_with_fallback(data: bytes) -> tuple[str, str]:
    """Decode ``data``, returning ``(text, encoding_used)``.

    Deterministic: the first encoding in the reference's chain that decodes
    without error wins.
    """
    for enc in _FALLBACK_CHAIN:
        try:
            return data.decode(enc), enc
        except UnicodeDecodeError:
            continue
    raise UnicodeDecodeError(
        "fallback-chain", data[:16], 0, 1, "failed to decode with all attempted encodings"
    )
