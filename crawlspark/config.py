"""Crawl configuration (SPEC.md `Config`; defaults from FIXTURES.md §4).

Everything is round-slot / count based — no wall-clock anywhere — so runs
are bit-reproducible across parallelism levels (SPEC.md, SURVEY.md §2
determinism rule).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class CrawlConfig:
    # politeness / scheduling
    max_fetches_per_host_per_round: int = 4   # B
    max_depth: int = 6                        # D
    round_capacity: int | None = 2000         # K (global per-round cap); None = uncapped
    hot_threshold: int = 64                   # H (pending count that triggers salting)
    max_salts: int = 16
    # seen-set layout
    n_buckets: int = 64                       # P (4096 at production scale)
    bloom_fpp: float = 0.01
    bloom_capacity_per_bucket: int = 1 << 16  # initial per-bucket capacity; grows by rebuild
    # hashing
    hash_seed: int = 42                       # Spark xxhash64 default — do not change
    salt_seed: int = 7
    # url validity
    max_url_len: int = 2048
    allowed_schemes: tuple[str, ...] = ("http", "https")
    # engine knobs (no effect on semantics)
    shuffle_partitions: int = 32
    use_bloom_prefilter: bool = True
    fetch_arrow: bool = False
    compact_seen_every: int | None = None  # compact seen deltas every N rounds  # measured: mapInPandas beats the flat-builder mapInArrow variant (BENCH notes)

    def with_(self, **kw) -> "CrawlConfig":
        return replace(self, **kw)


DEFAULT = CrawlConfig()


def test_tier() -> CrawlConfig:
    """FIXTURES.md §4 politeness config for the correctness tier."""
    return CrawlConfig()
