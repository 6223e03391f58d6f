"""Pure-Python MinHash kernel — the Spark-free twin of
``operators/dedup.py``'s expression pipeline (same tokenization, same
md5-prefix stable hash, same permutation constants), for the streaming
path where each arriving document computes its signature IN ROW (no
shuffle) before stateful banding.

A test pins this kernel byte-equal to the distributed expression path
(``tests/test_operators_misc.py``); the DuckDB oracles are built from the
same constants.
"""

from __future__ import annotations

import hashlib
import re

MERSENNE31 = 2147483647  # modulus for minhash permutations

# fixed permutation constants (a*x + b) mod P — deterministic, shared with
# the Spark expressions and the oracle SQL; 16 hashes → 4 bands × 4 rows
MINHASH_A = [13, 101, 499, 997, 1499, 1999, 2503, 3001, 3499, 4001, 4507, 5003, 5501, 6007, 6521, 7001]
MINHASH_B = [7, 97, 397, 797, 1201, 1601, 2003, 2411, 2801, 3203, 3607, 4003, 4409, 4801, 5209, 5641]
N_BANDS = 4
ROWS_PER_BAND = 4
SIMHASH_BITS = 16

_NON_ALNUM = re.compile(r"[^a-z0-9 ]")


def stable_hash32(s: str) -> int:
    """Twin of the cross-engine stable hash:
    Spark ``conv(substr(md5(s),1,8),16,10)`` == DuckDB
    ``CAST('0x'||substr(md5(s),1,8) AS BIGINT)``."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def normalized_words(text: str) -> list[str]:
    """Twin of ``dedup.normalized_words``: lowercase, strip non-alnum,
    split on whitespace runs."""
    return _NON_ALNUM.sub(" ", text.lower()).split()


def word_shingles(text: str, n: int = 3) -> set[str]:
    """Distinct n-word shingles; short docs collapse to one whole-doc
    shingle (twin of ``dedup.shingles_of``)."""
    words = normalized_words(text)
    if len(words) >= n:
        return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}
    return {" ".join(words)}


def minhash_signature(text: str, n: int = 3) -> list[int]:
    """16 minhash values: min over shingles of (a_i*sid + b_i) mod P."""
    sids = [stable_hash32(s) % MERSENNE31 for s in word_shingles(text, n)]
    return [
        min((a * sid + b) % MERSENNE31 for sid in sids)
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


def band_keys(signature: list[int]) -> list[tuple[int, str]]:
    """(band, key) pairs — key format matches the Spark/SQL banding
    (underscore-joined stringified row values)."""
    return [
        (
            b,
            "_".join(
                str(signature[b * ROWS_PER_BAND + r]) for r in range(ROWS_PER_BAND)
            ),
        )
        for b in range(N_BANDS)
    ]
