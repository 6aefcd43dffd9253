"""Partitioned Bloom filter for URL-seen membership (SURVEY.md §3 U-3/U-4/A3/S3).

The 10^10-URL design point (BASELINE.json:6): the seen set is split into P
buckets by ``bucket = pmod(url_hash, P)``; each bucket owns one bit-array
blob. At 10^10 keys / 1% FPP / P=4096 each blob is ~290 KB (~1.2 GB total),
broadcast as a per-bucket dict so executors probe locally without a shuffle.
Exactness is NOT entrusted to the filter: probes only pre-filter the exact
anti-join against the ``seen`` table (SURVEY.md §3.3 J1) — "maybe seen"
rows go through the join, "definitely new" rows bypass it. A Bloom false
positive therefore costs one extra join row, never a lost URL.

All build/probe math is numpy-vectorized over int64 hash arrays using the
Spark-compatible XXH64 long path (xxh64.hash_long_np) with two derived
seeds (double hashing, Kirsch–Mitzenmacher): bit_i = (g1 + i·g2) mod m.

Blob lifecycle per round: the engine computes per-bucket partial blobs of
the round's NEW hashes distributed (applyInPandas, U-4), collects the ≤P
small rows, ORs them into the driver-side registry, and re-broadcasts.
A bucket that outgrows its capacity is rebuilt at double capacity from the
exact seen table (driver triggers it; rare — amortized O(1) per key).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .xxh64 import hash_long_np

_SEED_G1 = 0xB100F
_SEED_G2 = 0xB10F1


def bloom_params(capacity: int, fpp: float) -> tuple[int, int]:
    """(m_bits, k_hashes) for a target capacity and false-positive rate."""
    capacity = max(1, capacity)
    m = math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64  # whole 64-bit words
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def _bit_positions(hashes: np.ndarray, m: int, k: int) -> list[np.ndarray]:
    g1 = hash_long_np(hashes, _SEED_G1)
    g2 = hash_long_np(hashes, _SEED_G2) | np.uint64(1)
    mm = np.uint64(m)
    return [((g1 + np.uint64(i) * g2) % mm) for i in range(k)]


def build_blob(hashes: np.ndarray, m: int, k: int) -> bytes:
    """Bit-array blob with all k positions of every hash set."""
    bits = np.zeros(m // 8, dtype=np.uint8)
    if len(hashes):
        for pos in _bit_positions(np.asarray(hashes, dtype=np.int64), m, k):
            np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                             np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))
    return bits.tobytes()


def probe_blob(hashes: np.ndarray, blob: bytes, m: int, k: int) -> np.ndarray:
    """Vectorized membership probe -> bool array ('maybe present')."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    bits = np.frombuffer(blob, dtype=np.uint8)
    out = np.ones(len(hashes), dtype=bool)
    for pos in _bit_positions(np.asarray(hashes, dtype=np.int64), m, k):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        out &= (byte & (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8))) != 0
    return out


def probe_chain(payloads: list[dict], buckets: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """OR of per-payload probes over (bucket, hash) arrays — the probe side
    of the sliced broadcast chain (consolidated base + per-round deltas).
    Never misses a key inserted into any link; FP rate <= the merged
    filter's (separate probes can't see a key's k bits split across two
    blobs, the merged blob can)."""
    flag = np.zeros(len(hashes), dtype=bool)
    for payload in payloads:
        for b in np.unique(buckets):
            ent = payload.get(int(b))
            if ent is None:
                continue
            m, k, blob = ent
            sel = (buckets == b) & ~flag
            if sel.any():
                flag[sel] = probe_blob(hashes[sel], blob, m, k)
    return flag


@dataclass
class BucketFilter:
    m: int
    k: int
    n: int  # items inserted
    capacity: int
    bits: np.ndarray  # uint8

    @classmethod
    def empty(cls, capacity: int, fpp: float) -> "BucketFilter":
        m, k = bloom_params(capacity, fpp)
        return cls(m, k, 0, capacity, np.zeros(m // 8, dtype=np.uint8))

    def absorb_blob(self, blob: bytes, n_new: int) -> None:
        self.bits |= np.frombuffer(blob, dtype=np.uint8)
        self.n += n_new

    def add(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        self.bits |= np.frombuffer(build_blob(hashes, self.m, self.k), dtype=np.uint8)
        self.n += len(hashes)

    def probe(self, hashes: np.ndarray) -> np.ndarray:
        return probe_blob(hashes, self.bits.tobytes(), self.m, self.k)


@dataclass
class BloomRegistry:
    """Driver-side {bucket: BucketFilter}; broadcast as plain dict for probing."""

    fpp: float
    initial_capacity: int
    filters: dict[int, BucketFilter] = field(default_factory=dict)

    def get(self, bucket: int) -> BucketFilter:
        f = self.filters.get(bucket)
        if f is None:
            f = BucketFilter.empty(self.initial_capacity, self.fpp)
            self.filters[bucket] = f
        return f

    def broadcast_payload(self) -> dict[int, tuple[int, int, bytes]]:
        """{bucket: (m, k, blob)} — what executors need for probing."""
        return {b: (f.m, f.k, f.bits.tobytes()) for b, f in self.filters.items()}

    def buckets_needing_growth(self, incoming: dict[int, int]) -> list[int]:
        out = []
        for bucket, n_new in incoming.items():
            f = self.get(bucket)
            if f.n + n_new > f.capacity:
                out.append(bucket)
        return out

    def rebuild(self, bucket: int, hashes: np.ndarray) -> None:
        """Fresh filter at ≥2× capacity holding exactly `hashes`."""
        cap = max(self.initial_capacity, 2 * max(len(hashes), self.get(bucket).capacity))
        f = BucketFilter.empty(cap, self.fpp)
        f.add(hashes)
        self.filters[bucket] = f

    def grown_capacity(self, bucket: int, n_total: int) -> int:
        """Rebuild target capacity for a bucket now holding n_total keys —
        same sizing rule as rebuild(), exposed so the blob itself can be
        built DISTRIBUTED (the driver only decides the size)."""
        return max(self.initial_capacity, 2 * max(n_total, self.get(bucket).capacity))

    def install(self, bucket: int, blob: bytes, m: int, k: int, n: int, capacity: int) -> None:
        """Adopt an externally-built (distributed) blob as the bucket's
        filter — the receive side of a distributed growth rebuild."""
        self.filters[bucket] = BucketFilter(
            int(m), int(k), int(n), int(capacity),
            np.frombuffer(bytes(blob), dtype=np.uint8).copy(),
        )

    # -- snapshot (exact-resume state, SURVEY.md §3.1 S3) -------------------
    def to_rows(self) -> list[tuple[int, bytes, int, int, int, int]]:
        """Rows for the SEEN_BLOOM schema:
        (bucket, blob, m_bits, k_hashes, n_items, capacity)."""
        return [
            (b, f.bits.tobytes(), f.m, f.k, f.n, f.capacity)
            for b, f in sorted(self.filters.items())
        ]

    @classmethod
    def from_rows(
        cls, rows, fpp: float, initial_capacity: int
    ) -> "BloomRegistry":
        """Rows are (bucket, blob, m, k, n, capacity); capacity is persisted
        explicitly so resume reproduces growth/rebuild timing exactly."""
        reg = cls(fpp=fpp, initial_capacity=initial_capacity)
        for bucket, blob, m, k, n, cap in rows:
            reg.filters[int(bucket)] = BucketFilter(
                int(m), int(k), int(n), int(cap),
                np.frombuffer(bytes(blob), dtype=np.uint8).copy(),
            )
        return reg
