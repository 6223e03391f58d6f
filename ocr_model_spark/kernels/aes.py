"""Pure-stdlib AES-128/256 CBC (FIPS-197), decrypt + encrypt.

Exists for one consumer: PDF standard-security-handler crypt filters
(``pdf_native.py`` — /AESV2 per-object decryption and the /AESV3 R6
Algorithm-2.B hardened hash, which needs CBC *encryption* inside its
round function). Python-speed AES is fine there: encrypted objects in
crawl PDFs are KBs, and the path is gated to documents that actually
declare /Encrypt.

Tables are COMPUTED (GF(2^8) exp/log via generator 3, affine transform)
rather than transcribed, and the whole cipher is pinned against the
FIPS-197 appendix vectors in tests — a transcription typo cannot hide.
"""

from __future__ import annotations


def _xtime(a: int) -> int:
    return ((a << 1) ^ 0x1B) & 0xFF if a & 0x80 else a << 1


_EXP = [0] * 510
_LOG = [0] * 256
_x = 1
for _i in range(255):
    _EXP[_i] = _x
    _LOG[_x] = _i
    _x ^= _xtime(_x)  # multiply by generator 3
for _i in range(255, 510):
    _EXP[_i] = _EXP[_i - 255]


def _gmul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return _EXP[_LOG[a] + _LOG[b]]


def _make_sbox() -> tuple[list[int], list[int]]:
    sbox = [0] * 256
    inv = [0] * 256
    for i in range(256):
        c = 0 if i == 0 else _EXP[255 - _LOG[i]]  # multiplicative inverse
        s = c
        for _ in range(4):
            c = ((c << 1) | (c >> 7)) & 0xFF
            s ^= c
        sbox[i] = s ^ 0x63
    for i, s in enumerate(sbox):
        inv[s] = i
    return sbox, inv


_SBOX, _INV_SBOX = _make_sbox()
_RCON = [1]
while len(_RCON) < 15:
    _RCON.append(_xtime(_RCON[-1]))


def _expand_key(key: bytes) -> list[list[int]]:
    """Round keys as a flat list of 4-byte words."""
    nk = len(key) // 4
    if nk not in (4, 8):
        raise ValueError("AES key must be 16 or 32 bytes")
    rounds = {4: 10, 8: 14}[nk]
    words = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    for i in range(nk, 4 * (rounds + 1)):
        w = list(words[i - 1])
        if i % nk == 0:
            w = w[1:] + w[:1]
            w = [_SBOX[b] for b in w]
            w[0] ^= _RCON[i // nk - 1]
        elif nk == 8 and i % nk == 4:
            w = [_SBOX[b] for b in w]
        words.append([a ^ b for a, b in zip(words[i - nk], w)])
    return words


def _add_round_key(state: list[int], words: list[list[int]], rnd: int) -> None:
    for c in range(4):
        w = words[4 * rnd + c]
        for r in range(4):
            state[4 * c + r] ^= w[r]


def _encrypt_block(block: bytes, words: list[list[int]], rounds: int) -> bytes:
    s = list(block)  # column-major: s[4*c + r]
    _add_round_key(s, words, 0)
    for rnd in range(1, rounds + 1):
        s = [_SBOX[b] for b in s]
        # ShiftRows: row r rotates left by r (state is column-major)
        s = [s[(4 * ((c + r) % 4)) + r] for c in range(4) for r in range(4)]
        if rnd < rounds:
            ns = [0] * 16
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                ns[4 * c + 0] = _gmul(a0, 2) ^ _gmul(a1, 3) ^ a2 ^ a3
                ns[4 * c + 1] = a0 ^ _gmul(a1, 2) ^ _gmul(a2, 3) ^ a3
                ns[4 * c + 2] = a0 ^ a1 ^ _gmul(a2, 2) ^ _gmul(a3, 3)
                ns[4 * c + 3] = _gmul(a0, 3) ^ a1 ^ a2 ^ _gmul(a3, 2)
            s = ns
        _add_round_key(s, words, rnd)
    return bytes(s)


def _decrypt_block(block: bytes, words: list[list[int]], rounds: int) -> bytes:
    s = list(block)
    _add_round_key(s, words, rounds)
    for rnd in range(rounds - 1, -1, -1):
        # InvShiftRows: row r rotates right by r
        s = [s[(4 * ((c - r) % 4)) + r] for c in range(4) for r in range(4)]
        s = [_INV_SBOX[b] for b in s]
        _add_round_key(s, words, rnd)
        if rnd > 0:
            ns = [0] * 16
            for c in range(4):
                a0, a1, a2, a3 = s[4 * c : 4 * c + 4]
                ns[4 * c + 0] = _gmul(a0, 14) ^ _gmul(a1, 11) ^ _gmul(a2, 13) ^ _gmul(a3, 9)
                ns[4 * c + 1] = _gmul(a0, 9) ^ _gmul(a1, 14) ^ _gmul(a2, 11) ^ _gmul(a3, 13)
                ns[4 * c + 2] = _gmul(a0, 13) ^ _gmul(a1, 9) ^ _gmul(a2, 14) ^ _gmul(a3, 11)
                ns[4 * c + 3] = _gmul(a0, 11) ^ _gmul(a1, 13) ^ _gmul(a2, 9) ^ _gmul(a3, 14)
            s = ns
    return bytes(s)


def encrypt_block(key: bytes, block: bytes) -> bytes:
    words = _expand_key(key)
    return _encrypt_block(block, words, {16: 10, 32: 14}[len(key)])


def decrypt_block(key: bytes, block: bytes) -> bytes:
    words = _expand_key(key)
    return _decrypt_block(block, words, {16: 10, 32: 14}[len(key)])


def cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """CBC encrypt WITHOUT padding (len(data) must be a block multiple) —
    the shape Algorithm 2.B needs."""
    if len(data) % 16:
        raise ValueError("cbc_encrypt needs block-aligned data")
    words = _expand_key(key)
    rounds = {16: 10, 32: 14}[len(key)]
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(blk, words, rounds)
        out += prev
    return bytes(out)


def cbc_decrypt(key: bytes, iv: bytes, data: bytes, unpad: bool = True) -> bytes:
    """CBC decrypt; ``unpad`` strips PKCS#7 (tolerant: malformed padding
    is returned as-is rather than raising — crawl data is hostile)."""
    if len(data) % 16 or not data:
        raise ValueError("cbc_decrypt needs non-empty block-aligned data")
    words = _expand_key(key)
    rounds = {16: 10, 32: 14}[len(key)]
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        blk = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(blk, words, rounds), prev))
        prev = blk
    if unpad and out:
        p = out[-1]
        if 1 <= p <= 16 and p <= len(out) and all(b == p for b in out[-p:]):
            del out[-p:]
    return bytes(out)
