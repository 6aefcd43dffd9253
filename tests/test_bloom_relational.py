"""Executor-side Bloom state (cfg.bloom_mode='relational', VERDICT r02 #1):
blobs live as parquet rows merged/probed where the data lives — NO driver
BloomRegistry, NO sc.broadcast of any blob payload, ever (including
compaction rounds). Crawl results must stay bit-equal to the oracle (and
hence to broadcast mode); the chain must be physically delta-shaped."""

import os
import shutil

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 5
CFG = CrawlConfig(bloom_mode="relational", bloom_rebroadcast_every=3)


def _crawl(spark, cfg, ckpt, rounds=ROUNDS):
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg,
        FetchSpec(), ckpt=ckpt
    )
    infos = rnd.run_crawl(st, max_rounds=rounds)
    return st, infos


def test_relational_bloom_matches_oracle_with_zero_broadcasts(spark):
    ckpt = "/tmp/crawlspark-test-rbloom"
    # any blob broadcast would have to flow through bloom_broadcasts() —
    # poison it so the test fails loudly if the relational path ever does
    orig = rnd.CrawlState.bloom_broadcasts
    rnd.CrawlState.bloom_broadcasts = lambda self: (_ for _ in ()).throw(
        AssertionError("blob broadcast in relational mode")
    )
    try:
        st, infos = _crawl(spark, CFG, ckpt)
    finally:
        rnd.CrawlState.bloom_broadcasts = orig
    assert st.registry is None  # no driver-resident registry exists at all
    assert st.bloom_base_bcast is None and not st.bloom_delta_bcasts

    oracle = simulate(fixtures.seed_urls(), CFG, FetchSpec(), max_rounds=ROUNDS)
    got = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()]
    assert got == oracle.crawl_order
    assert [(i["round"], i["selected"], i["new"], i["frontier"]) for i in infos] == [
        (o["round"], o["selected"], o["new"], o["frontier"]) for o in oracle.rounds
    ]
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert seen == oracle.seen


def test_relational_bloom_is_physically_delta(spark):
    ckpt = "/tmp/crawlspark-test-rbloom2"
    st, _ = _crawl(spark, CFG, ckpt)
    bases = set(st.store.bloom_bases())
    assert 0 in bases and 3 in bases  # init + bloom_rebroadcast_every cadence
    for r in range(1, st.next_round):
        assert st.store.exists(r, "bloom_delta")  # O(batch) rows, no collect
        if r not in bases:
            assert not os.path.exists(
                os.path.join(ckpt, f"round={r}", "bloom", "_SUCCESS")
            )
    # the compacted base is one row per bucket and counts every seen key
    base = st.store.read(3, "bloom")
    rows = base.collect()
    assert len({r["bucket"] for r in rows}) == len(rows)
    n_seen_at_3 = st.store.read_seen(3).count()
    assert sum(r["n_items"] for r in rows) == n_seen_at_3


def test_relational_bloom_growth_at_compaction(spark):
    """Tiny capacity forces the compaction's rebuild path (grown (m,k) from
    the exact seen table, distributed) — results unchanged, capacity grew."""
    cfg = CFG.with_(bloom_capacity_per_bucket=8)
    ckpt = "/tmp/crawlspark-test-rbloom-grow"
    st, _ = _crawl(spark, cfg, ckpt)
    oracle = simulate(fixtures.seed_urls(), cfg, FetchSpec(), max_rounds=ROUNDS)
    got = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()]
    assert got == oracle.crawl_order
    last_base = max(st.store.bloom_bases())
    caps = {r["bucket"]: r["capacity"] for r in st.store.read(last_base, "bloom").collect()}
    assert any(c > 8 for c in caps.values()), "no bucket ever grew"


def test_relational_bloom_resume_exact(spark):
    ck_a = "/tmp/crawlspark-test-rbloom-a"
    ck_b = "/tmp/crawlspark-test-rbloom-b"
    st_a, _ = _crawl(spark, CFG, ck_a, rounds=ROUNDS)
    _crawl(spark, CFG, ck_b, rounds=2)
    st_b2 = rnd.resume(spark, ck_b, CFG, FetchSpec())
    assert st_b2.registry is None
    rnd.run_crawl(st_b2, max_rounds=ROUNDS)
    oa = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_a).collect()]
    ob = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_b2, ROUNDS).collect()]
    assert oa == ob


def test_mode_switch_resume_builds_base(spark):
    """Resuming a BROADCAST-mode checkpoint in relational mode must build a
    base from the exact seen table — without it, pre-resume keys would probe
    'definitely new' and bypass the exact anti-join."""
    ckpt = "/tmp/crawlspark-test-rbloom-switch"
    _crawl(spark, CrawlConfig(), ckpt, rounds=2)  # broadcast-mode checkpoint
    st2 = rnd.resume(spark, ckpt, CFG, FetchSpec())
    assert st2.store.bloom_bases(), "no base recorded at mode-switch resume"
    rnd.run_crawl(st2, max_rounds=ROUNDS)
    st_ref, _ = _crawl(spark, CFG, "/tmp/crawlspark-test-rbloom-switch-ref")
    oa = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_ref).collect()]
    ob = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st2, ROUNDS).collect()]
    assert oa == ob


def test_mode_switch_resume_relational_to_broadcast(spark):
    """The REVERSE switch (relational checkpoint resumed in broadcast mode)
    must rebuild the driver registry from the exact seen table when the
    last round carries no bloom snapshot (relational mode persists bloom
    rows only at base rounds) — previously an opaque parquet
    path-not-found. Crawl results must match an unbroken broadcast run
    (FP-history differences are absorbed by the exact anti-join tier)."""
    ckpt = "/tmp/crawlspark-test-rbloom-switch-back"
    # relational checkpoint whose LAST round is not a bloom base
    # (rebroadcast_every=3 -> bases at 0 and 3; last round = 4)
    _crawl(spark, CFG, ckpt, rounds=4)
    assert not os.path.exists(
        os.path.join(ckpt, "round=4", "bloom", "_SUCCESS")
    )
    st2 = rnd.resume(spark, ckpt, CrawlConfig(bloom_mode="broadcast"), FetchSpec())
    assert st2.registry is not None and st2.registry.filters
    rnd.run_crawl(st2, max_rounds=ROUNDS)
    st_ref, _ = _crawl(
        spark, CrawlConfig(bloom_mode="broadcast"),
        "/tmp/crawlspark-test-rbloom-switch-back-ref",
    )
    oa = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_ref).collect()]
    ob = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st2, ROUNDS).collect()]
    assert oa == ob


def test_bloom_mode_auto_resolution():
    """'auto' resolves by projected broadcast payload (n_buckets × m/8):
    test scale stays broadcast; the 10^10 design point (4096 × ~290 KB ≈
    1.2 GB) flips to relational with no config change."""
    from crawlspark.round import resolve_bloom_relational

    assert not resolve_bloom_relational(CrawlConfig())  # 64 × ~78 KB ≈ 5 MB
    assert resolve_bloom_relational(
        CrawlConfig(n_buckets=4096, bloom_capacity_per_bucket=2_441_406)
    )
    assert resolve_bloom_relational(CrawlConfig(bloom_mode="relational"))
    assert not resolve_bloom_relational(
        CrawlConfig(bloom_mode="broadcast", n_buckets=1 << 20)
    )


def test_all_three_scale_features_compose(spark):
    """Delta frontier (default) × adaptive politeness × relational Bloom —
    the full 10^10-mode stack in one crawl — must stay oracle-bit-equal."""
    cfg = CrawlConfig(
        bloom_mode="relational",
        bloom_rebroadcast_every=3,
        adaptive_politeness=True,
        compact_frontier_every=3,
    )
    spec = FetchSpec(not_found_mod=2)  # errors trip the adaptive multipliers
    ckpt = "/tmp/crawlspark-test-rbloom-all3"
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg, spec,
        ckpt=ckpt,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, cfg, spec, max_rounds=ROUNDS)
    got = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()]
    assert got == oracle.crawl_order
    assert [(i["round"], i["selected"], i["new"], i["frontier"]) for i in infos] == [
        (o["round"], o["selected"], o["new"], o["frontier"]) for o in oracle.rounds
    ]
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert seen == oracle.seen
    assert st.registry is None and st.bloom_base_bcast is None
