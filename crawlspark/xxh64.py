"""Pure-Python + numpy XXH64, bit-compatible with Spark's ``xxhash64``.

Spark's ``F.xxhash64(col)`` (org.apache.spark.sql.catalyst.expressions.XxHash64)
hashes each child value with XXH64, chaining: the running hash starts at the
seed (42 by default) and each column's hash becomes the seed for the next.
Per-type encodings (matching Spark's XXH64 / XxHash64Function):

- StringType  -> XXH64 over the UTF-8 bytes (``hash_bytes``)
- LongType    -> 8-byte little-endian single-word path (``hash_long``)
- IntegerType -> hashed AS A LONG in Spark (ints are promoted); use
  ``hash_long`` for int32 columns and literals too.

The oracle simulator (oracle/simulator.py) and the fixture generators use
these to reproduce engine-side hashes exactly; tests/test_xxh64.py verifies
bit-equality against live Spark for strings of every tail-length class and
for long values.

All Python-int paths mask to 64 bits; results are returned as *signed*
int64 (Spark LongType semantics) so ordering comparisons match Spark's
``ORDER BY hash`` ascending.

``hash_long_np`` is a numpy-vectorized variant used by the Bloom filter
(crawlspark/bloom.py) so probe/build stay vectorized inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = 0xFFFFFFFFFFFFFFFF

SPARK_DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def hash_bytes(data: bytes, seed: int = SPARK_DEFAULT_SEED) -> int:
    """XXH64 of a byte string; == Spark xxhash64 on a StringType value."""
    seed &= _M
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _signed(_fmix(h))


def hash_long(value: int, seed: int = SPARK_DEFAULT_SEED) -> int:
    """XXH64 single-8-byte-word path; == Spark xxhash64 on a LongType value."""
    seed &= _M
    value &= _M
    h = (seed + _P5 + 8) & _M
    h ^= _round(0, value)
    h = (_rotl(h, 27) * _P1 + _P4) & _M
    return _signed(_fmix(h))


def hash_str(s: str, seed: int = SPARK_DEFAULT_SEED) -> int:
    return hash_bytes(s.encode("utf-8"), seed)


def _signed(v: int) -> int:
    v &= _M
    return v - (1 << 64) if v >= (1 << 63) else v


def pmod(value: int, mod: int) -> int:
    """Spark's pmod on signed int64: ((v % m) + m) % m with Java's remainder.

    Python's % already returns a non-negative result for positive mod, but
    Java's % is a *remainder* (sign of dividend).  pmod(v, m) in Spark is
    defined as ((v % m) + m) % m using Java %, which equals Python's v % m
    for m > 0.  Keep this helper for clarity and negative-mod safety.
    """
    return value % mod if mod > 0 else -((-value) % (-mod))


# ---------------------------------------------------------------------------
# numpy-vectorized long path (for Bloom build/probe over hash arrays)
# ---------------------------------------------------------------------------

_NP_P1 = np.uint64(_P1)
_NP_P2 = np.uint64(_P2)
_NP_P4 = np.uint64(_P4)
_NP_P5 = np.uint64(_P5)


def _np_rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def hash_long_np(values: np.ndarray, seed: int = SPARK_DEFAULT_SEED) -> np.ndarray:
    """Vectorized ``hash_long`` over an int64/uint64 array -> uint64 array."""
    with np.errstate(over="ignore"):
        v = values.astype(np.uint64, copy=False)
        k1 = _np_rotl(v * _NP_P2, 31) * _NP_P1
        h = np.full(v.shape, np.uint64((seed + _P5 + 8) & _M), dtype=np.uint64)
        h ^= k1
        h = _np_rotl(h, 27) * _NP_P1 + _NP_P4
        h ^= h >> np.uint64(33)
        h *= np.uint64(_P2)
        h ^= h >> np.uint64(29)
        h *= np.uint64(_P3)
        h ^= h >> np.uint64(32)
        return h


# ---------------------------------------------------------------------------
# numpy-vectorized variable-length byte-string path (candidate hot path):
# rows are padded into a (n, W) uint8 matrix; each algorithm step runs as a
# masked numpy op over the rows whose length reaches that step, so the
# per-row python cost collapses to one memcpy.  Bit-equality with the scalar
# ``hash_bytes`` (and hence Spark xxhash64 on strings) is tested across every
# tail-length class in tests/test_xxh64.py.
# ---------------------------------------------------------------------------

_NP_P3 = np.uint64(_P3)


def _np_round0(inp: np.ndarray) -> np.ndarray:
    return _np_rotl(inp * _NP_P2, 31) * _NP_P1


def hash_bytes_np(items: list[bytes], seed: int = SPARK_DEFAULT_SEED) -> np.ndarray:
    """Vectorized ``hash_bytes`` over a list of byte strings -> int64 array."""
    n_items = len(items)
    if n_items == 0:
        return np.empty(0, dtype=np.int64)
    lens = np.fromiter((len(b) for b in items), np.int64, n_items)
    maxlen = int(lens.max())
    w8 = max(8, ((maxlen + 7) // 8) * 8)
    buf = np.zeros((n_items, w8), dtype=np.uint8)
    for i, b in enumerate(items):
        if b:
            buf[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    words = buf.view("<u8")          # (n, w8/8) little-endian 64-bit lanes
    dwords = buf.view("<u4")         # (n, w8/4) little-endian 32-bit lanes

    with np.errstate(over="ignore"):
        h = np.full(n_items, np.uint64((seed + _P5) & _M), dtype=np.uint64)
        big = lens >= 32
        if big.any():
            bw = words[big]
            nstripes = lens[big] // 32
            v1 = np.full(bw.shape[0], np.uint64((seed + _P1 + _P2) & _M))
            v2 = np.full(bw.shape[0], np.uint64((seed + _P2) & _M))
            v3 = np.full(bw.shape[0], np.uint64(seed & _M))
            v4 = np.full(bw.shape[0], np.uint64((seed - _P1) & _M))

            def rnd(acc, inp):
                return _np_rotl(acc + inp * _NP_P2, 31) * _NP_P1

            for s in range(int(nstripes.max())):
                m = nstripes > s
                base = s * 4
                v1[m] = rnd(v1[m], bw[m, base])
                v2[m] = rnd(v2[m], bw[m, base + 1])
                v3[m] = rnd(v3[m], bw[m, base + 2])
                v4[m] = rnd(v4[m], bw[m, base + 3])
            hb = _np_rotl(v1, 1) + _np_rotl(v2, 7) + _np_rotl(v3, 12) + _np_rotl(v4, 18)
            for v in (v1, v2, v3, v4):
                hb = (hb ^ _np_round0(v)) * _NP_P1 + _NP_P4
            h[big] = hb
        h = h + lens.astype(np.uint64)

        # 8-byte tail words, in order, from the stripe end
        start_w = (lens // 32) * 4
        n_words = lens // 8
        for w in range(int(n_words.max())):
            m = (start_w <= w) & (w < n_words)
            if not m.any():
                continue
            idx = np.nonzero(m)[0]
            hm = h[idx] ^ _np_round0(words[idx, w])
            h[idx] = _np_rotl(hm, 27) * _NP_P1 + _NP_P4

        # one 4-byte word if >= 4 bytes remain
        o4 = (lens // 8) * 8
        m4 = (lens - o4) >= 4
        if m4.any():
            idx = np.nonzero(m4)[0]
            w4 = dwords[idx, o4[m4] // 4].astype(np.uint64)
            hm = h[idx] ^ (w4 * _NP_P1)
            h[idx] = _np_rotl(hm, 23) * _NP_P2 + _NP_P3

        # trailing single bytes
        ob = o4 + np.where(m4, 4, 0)
        rem = lens - ob
        for j in range(int(rem.max()) if n_items else 0):
            m = rem > j
            idx = np.nonzero(m)[0]
            byte = buf[idx, ob[m] + j].astype(np.uint64)
            hm = h[idx] ^ (byte * _NP_P5)
            h[idx] = _np_rotl(hm, 11) * _NP_P1

        h ^= h >> np.uint64(33)
        h *= _NP_P2
        h ^= h >> np.uint64(29)
        h *= _NP_P3
        h ^= h >> np.uint64(32)
    return h.view(np.int64)


def hash_str_np(strings, seed: int = SPARK_DEFAULT_SEED) -> np.ndarray:
    """Vectorized ``hash_str`` over an iterable of python strings."""
    return hash_bytes_np([s.encode("utf-8") for s in strings], seed)
