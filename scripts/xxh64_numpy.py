"""Vectorized XXH64 (seed=42, Spark-compatible) over Arrow string arrays.

Prototype for the round-14 minhash/simhash Arrow path (guide §4.2): hash
many short byte strings in numpy without a per-row Python loop. Verified
bit-identical to Spark's `xxhash64` over every corpus token and over
random byte strings of length 0..100 (all tail paths + stripe path) by
scripts/validate_xxh64.py before adoption.
"""

from __future__ import annotations

import numpy as np

_P1 = np.uint64(11400714785074694791)
_P2 = np.uint64(14029467366897019727)
_P3 = np.uint64(1609587929392839161)
_P4 = np.uint64(9650029242287828579)
_P5 = np.uint64(2870177450012600261)
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def xxh64_words(words: np.ndarray, lengths: np.ndarray, seed: int = 42) -> np.ndarray:
    """XXH64 of n byte strings packed as a (n, W) little-endian uint64 word
    matrix (zero-padded past each string's length). Returns uint64[n].

    Mirrors the reference xxHash64 layout Spark's XXH64 implements:
    32-byte stripes with 4 lanes, then 8-byte words, one 4-byte word,
    then single bytes, then the avalanche.
    """
    n = len(lengths)
    L = lengths.astype(np.int64)
    h = np.full(n, (np.uint64(seed) + _P5) & _M64, dtype=np.uint64)
    long_rows = np.nonzero(L >= 32)[0]
    if long_rows.size:
        s64 = np.uint64(seed)
        v1 = np.full(long_rows.size, (s64 + _P1 + _P2) & _M64, dtype=np.uint64)
        v2 = np.full(long_rows.size, (s64 + _P2) & _M64, dtype=np.uint64)
        v3 = np.full(long_rows.size, s64, dtype=np.uint64)
        v4 = np.full(long_rows.size, (s64 - _P1) & _M64, dtype=np.uint64)
        nstripes = (L[long_rows] // 32).astype(np.int64)
        lanes = [v1, v2, v3, v4]
        for s in range(int(nstripes.max())):
            m = nstripes > s
            rows = long_rows[m]
            for lane in range(4):
                w = words[rows, 4 * s + lane]
                lanes[lane][m] = _rotl(lanes[lane][m] + w * _P2, 31) * _P1
        hl = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        )
        for lane in lanes:
            hl ^= _rotl(lane * _P2, 31) * _P1
            hl = hl * _P1 + _P4
        h[long_rows] = hl
    h = h + L.astype(np.uint64)
    # tail after the stripe region
    p = np.where(L >= 32, (L // 32) * 32, 0)
    n8 = (L - p) // 8
    for j in range(int(n8.max()) if n else 0):
        m = n8 > j
        w = words[np.nonzero(m)[0], p[m] // 8 + j]
        k1 = _rotl(w * _P2, 31) * _P1
        h[m] = _rotl(h[m] ^ k1, 27) * _P1 + _P4
    p = p + n8 * 8
    m4 = (L - p) >= 4
    if m4.any():
        w = words[np.nonzero(m4)[0], p[m4] // 8]
        u32 = w & np.uint64(0xFFFFFFFF)
        h[m4] = _rotl(h[m4] ^ (u32 * _P1), 23) * _P2 + _P3
    p = p + np.where(m4, 4, 0)
    rem = L - p
    for j in range(int(rem.max()) if n else 0):
        m = rem > j
        q = p[m] + j
        b = (words[np.nonzero(m)[0], q // 8] >> ((q % 8) * 8).astype(np.uint64)) & np.uint64(0xFF)
        h[m] = _rotl(h[m] ^ (b * _P5), 11) * _P1
    h ^= h >> np.uint64(33)
    h *= _P2
    h ^= h >> np.uint64(29)
    h *= _P3
    h ^= h >> np.uint64(32)
    return h


def pack_strings(offsets: np.ndarray, data: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack n strings given by int offsets into data (uint8) into a
    (n, W) little-endian uint64 word matrix plus lengths."""
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    n = len(lengths)
    maxlen = int(lengths.max()) if n else 0
    W = max((maxlen + 7) // 8, 1)
    mat = np.zeros((n, W * 8), dtype=np.uint8)
    if maxlen:
        col = np.arange(maxlen)
        idx = offsets[:-1, None] + col[None, :]
        mask = col[None, :] < lengths[:, None]
        np.copyto(mat[:, :maxlen], data[np.minimum(idx, len(data) - 1)], where=mask)
    words = mat.view("<u8")
    return words, lengths


def xxh64_arrow_strings(arr) -> np.ndarray:
    """XXH64(seed=42) for every element of a pyarrow StringArray (no nulls),
    returned as uint64[n]."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    buffers = arr.buffers()
    offs = np.frombuffer(buffers[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.zeros(0, np.uint8)
    words, lengths = pack_strings(offs.astype(np.int64), data)
    return xxh64_words(words, lengths)
