"""Bit-equality of crawlspark.xxh64 vs Spark's xxhash64 (the determinism
backbone — SURVEY.md §2)."""

import numpy as np
from pyspark.sql import functions as F

from crawlspark.xxh64 import hash_long, hash_long_np, hash_str

STRINGS = [
    "",
    "a",
    "abc",
    "abcdefg",        # 7: byte tail
    "abcdefgh",       # 8: one word
    "abcdefghijk",    # 11: word + 4-byte-ish tail
    "abcdefghijklm",  # 13
    "x" * 31,
    "x" * 32,         # stripe boundary
    "x" * 33,
    "a" * 100,
    "http://h3.example/p/12345",
    "héllo wörld ünïcode ✓",
    "http://EXAMPLE.com:80/a/../b?q=1#frag",
]
LONGS = [0, 1, -1, 42, 7, 2**62, -(2**62), 123456789012345, -987654321]


def test_string_hash_matches_spark(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = {r["s"]: r["h"] for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in STRINGS:
        assert hash_str(s) == got[s], repr(s)


def test_long_hash_matches_spark(spark):
    df = spark.createDataFrame([(v,) for v in LONGS], "v long")
    got = {r["v"]: r["h"] for r in df.select("v", F.xxhash64("v").alias("h")).collect()}
    for v in LONGS:
        assert hash_long(v) == got[v], v


def test_chained_hash_matches_spark(spark):
    """Seed-chaining used by the salt column: xxhash64(url, 7L)."""
    df = spark.createDataFrame([(s,) for s in STRINGS if s], "s string")
    got = {
        r["s"]: r["h"]
        for r in df.select(
            "s", F.xxhash64("s", F.lit(7).cast("long")).alias("h")
        ).collect()
    }
    for s, h in got.items():
        assert hash_long(7, seed=hash_str(s) & 0xFFFFFFFFFFFFFFFF) == h


def test_numpy_long_path_matches_scalar():
    arr = np.array(LONGS, dtype=np.int64)
    for seed in (42, 0xB100F, 0xB10F1):
        vec = hash_long_np(arr, seed).astype(np.int64)
        for i, v in enumerate(LONGS):
            assert int(vec[i]) == hash_long(v, seed)


def test_numpy_bytes_path_matches_scalar():
    """hash_bytes_np covers every tail-length class (0..34 spans: empty,
    byte-tail, 4-byte step, 8-byte words, 32-byte stripes) and long inputs."""
    from crawlspark.xxh64 import hash_bytes, hash_bytes_np, hash_str, hash_str_np

    rng = np.random.default_rng(7)
    items = [bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
             for n in list(range(0, 70)) + [127, 128, 255, 1024, 2048]]
    for seed in (42, 0xB100F):
        vec = hash_bytes_np(items, seed)
        for i, b in enumerate(items):
            assert int(vec[i]) == hash_bytes(b, seed), (i, len(b))
    strings = ["", "a", "http://h1.example/p/123", "x" * 33, "ü" * 20, "مرحبا" * 9]
    vec = hash_str_np(strings)
    for i, s in enumerate(strings):
        assert int(vec[i]) == hash_str(s), repr(s)
