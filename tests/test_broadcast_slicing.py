"""Sliced round broadcasts (VERDICT r01 item 4): the per-round Bloom
broadcast ships ONLY changed buckets, the chain re-consolidates, and the
robots filter has a relational (no-driver-dict) mode — all without changing
a single output bit (crawl order + seen digests vs the pure-Python oracle).
"""

import shutil

import duckdb
import pytest

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 4


def _crawl(spark, cfg, ckpt):
    spec = FetchSpec()
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg, spec, ckpt=ckpt
    )
    rnd.run_crawl(st, max_rounds=ROUNDS)
    order = [
        (r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()
    ]
    seen = sorted(r["url_hash"] for r in rnd.read_final_seen(st).collect())
    return st, order, seen


def _changed_buckets(ckpt: str, r: int) -> int:
    con = duckdb.connect()
    return con.execute(
        f"SELECT COUNT(DISTINCT bucket) FROM read_parquet('{ckpt}/round={r}/seen_delta/*.parquet')"
    ).fetchone()[0]


def test_bloom_delta_broadcast_is_o_changed_buckets(spark):
    """Each round's delta broadcast must carry exactly the buckets that
    gained new hashes that round — not the whole registry."""
    ckpt = "/tmp/crawlspark-test-slice"
    cfg = CrawlConfig(bloom_rebroadcast_every=100)  # no compaction mid-test
    st, order, seen = _crawl(spark, cfg, ckpt)
    # after ROUNDS rounds the chain is base + one delta per non-empty round
    assert 1 <= len(st.bloom_delta_bcasts) <= ROUNDS
    # last round's delta carries exactly the changed buckets of that round
    last_r = st.next_round - 1
    assert st.last_bloom_delta_buckets == _changed_buckets(ckpt, last_r)
    # and strictly fewer than the registry's bucket count would be at scale;
    # here just assert it's a subset-sized payload, not the full registry
    assert st.last_bloom_delta_buckets <= len(st.registry.filters)
    # the delta payload really is per-bucket blobs of that round only
    delta = st.bloom_delta_bcasts[-1].value
    assert set(delta) == {
        b
        for (b,) in duckdb.connect()
        .execute(
            f"SELECT DISTINCT bucket FROM read_parquet('{ckpt}/round={last_r}/seen_delta/*.parquet')"
        )
        .fetchall()
    }
    # oracle equality: slicing must not change a single scheduled URL
    oracle = simulate(fixtures.seed_urls(), cfg, FetchSpec(), max_rounds=ROUNDS)
    assert order == oracle.crawl_order


def test_chain_compaction_resets_deltas(spark):
    """With bloom_rebroadcast_every=2 the chain must consolidate (deltas
    reset to empty) instead of growing unboundedly."""
    cfg = CrawlConfig(bloom_rebroadcast_every=2)
    st, order, _ = _crawl(spark, cfg, "/tmp/crawlspark-test-slice2")
    assert len(st.bloom_delta_bcasts) <= 1  # compacted at least once
    oracle = simulate(fixtures.seed_urls(), cfg, FetchSpec(), max_rounds=ROUNDS)
    assert order == oracle.crawl_order


def test_robots_relational_mode_digest_equality(spark):
    """cfg.robots_relational (broadcast join + vectorized UDF, no driver
    dict) must be bit-identical to the fused dict mode."""
    _, order_dict, seen_dict = _crawl(
        spark, CrawlConfig(), "/tmp/crawlspark-test-robd"
    )
    st, order_rel, seen_rel = _crawl(
        spark, CrawlConfig(robots_relational=True), "/tmp/crawlspark-test-robr"
    )
    assert st.robots_rules_bcast is None  # no python dict was ever built
    assert order_rel == order_dict
    assert seen_rel == seen_dict


def test_robots_auto_selects_relational(spark):
    """VERDICT r02 #3: above robots_relational_threshold rule-bearing hosts
    the engine flips to relational mode on its own (cfg untouched) — and the
    digests don't move."""
    cfg = CrawlConfig(robots_relational_threshold=2)  # fixture universe >> 2
    st, order, seen = _crawl(spark, cfg, "/tmp/crawlspark-test-rob-auto")
    assert st.robots_relational and not cfg.robots_relational
    assert st.robots_rules_bcast is None  # dict mode never engaged
    _, order_d, seen_d = _crawl(
        spark, CrawlConfig(), "/tmp/crawlspark-test-rob-auto-ref"
    )
    assert order == order_d
    assert seen == seen_d
