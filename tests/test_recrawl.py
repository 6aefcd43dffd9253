"""Opt-in closed-loop recrawl scheduling (CrawlConfig.recrawl_every over a
FetchSpec.change_mod universe of round-churning content): already-fetched
URLs re-enter the frontier on their host's observed-changefreq interval
(sitemaps.recrawl_state_merge / recrawl_due; Cho & Garcia-Molina uniform
allocation in ×4 fixed-point) and ride the normal scheduler. Full engine ⇔
oracle equality including the per-URL state table, non-vacuity (URLs are
actually refetched; both changed and unchanged pairs accrue; observed
classes actually diverge), and run+resume exactness across the state."""

import shutil

import pytest
from pyspark.sql import functions as F

from crawlspark import fetch_spec as fs
from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 7
CKPT = "/tmp/crawlspark-test-recrawl"
SPEC = FetchSpec(change_mod=3)
CFG = CrawlConfig(recrawl_every=2, recrawl_interval=2)


def test_change_mod_deterministic_and_gated():
    # off by default: round-keyed calls identical to the pre-flag universe
    for k in range(30):
        u = f"http://h{k % 7}.example/p/{k}"
        assert fs.simulate_fetch(u, FetchSpec(), 3) == fs.simulate_fetch(
            u, FetchSpec(change_mod=0), 3
        )
    # on: deterministic per (url, round); some URLs churn across rounds,
    # others stay byte-identical; media_refs (crawl expansion) never move
    churn = static = 0
    for k in range(40):
        u = f"http://h{k % 7}.example/p/{k}"
        s1, sp1 = fs.simulate_fetch(u, SPEC, 1)
        s2, sp2 = fs.simulate_fetch(u, SPEC, 2)
        assert (s1, sp1) == fs.simulate_fetch(u, SPEC, 1)
        if s1 != 200:
            continue
        if sp1 == sp2:
            static += 1
        else:
            churn += 1
            assert [x["media_ref"] for x in sp1] == [
                x["media_ref"] for x in sp2
            ]
    assert churn > 3 and static > 3


@pytest.fixture(scope="module")
def recrawl_pair(spark):
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=CKPT,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, CFG, SPEC, max_rounds=ROUNDS)
    return st, infos, oracle


def test_recrawl_order_and_counters_match_oracle(recrawl_pair):
    st, infos, oracle = recrawl_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order
    assert [
        (i["round"], i["selected"], i["new"], i["frontier"], i["recrawled"])
        for i in infos
    ] == [
        (o["round"], o["selected"], o["new"], o["frontier"], o["recrawled"])
        for o in oracle.rounds
    ]
    # non-vacuity: the loop actually refreshed — some URL fetched twice
    assert sum(i["recrawled"] for i in infos) > 0
    urls = [u for _r, _s, u in got]
    assert len(urls) > len(set(urls))


def test_recrawl_seen_set_untouched(recrawl_pair):
    """A refresh is not a discovery: the seen set equals the oracle's and
    contains one row per URL even though some were fetched twice."""
    st, _, oracle = recrawl_pair
    rows = rnd.read_final_seen(st).collect()
    got = {r["url_hash"]: r["url"] for r in rows}
    assert len(rows) == len(got)
    assert got == oracle.seen


def test_recrawl_state_matches_oracle(recrawl_pair):
    st, _, oracle = recrawl_pair
    last = st.next_round - 1
    rows = st.store.read(last, "recrawl_state").collect()
    got = {
        r["url_hash"]: (
            r["url"], r["host"], r["host_hash"], r["priority"],
            r["crawl_depth"], r["last_fetch_round"], r["fingerprint"],
            r["n_changed"], r["n_unchanged"], r["enqueued_round"],
        )
        for r in rows
    }
    exp = {
        uh: (
            s["url"], s["host"], s["hh"], s["prio"], s["depth"], s["last"],
            s["fp"], s["n_changed"], s["n_unchanged"], s["enq"],
        )
        for uh, s in oracle.recrawl_state.items()
    }
    assert got == exp
    # non-vacuity: the observed-class estimator saw BOTH outcomes, so the
    # interval classes genuinely diverge between churning and static hosts
    assert sum(s["n_changed"] for s in oracle.recrawl_state.values()) > 0
    assert sum(s["n_unchanged"] for s in oracle.recrawl_state.values()) > 0


def test_recrawl_frontier_snapshots(recrawl_pair):
    st, _, oracle = recrawl_pair
    for r in sorted(oracle.frontier_by_round):
        got = sorted(
            (
                row["url"], row["url_hash"], row["priority"],
                row["crawl_depth"], row["discovered_round"],
                row["not_before_round"],
            )
            for row in rnd.read_frontier_view(st, r).collect()
        )
        exp = sorted(
            (
                e.url, e.url_hash, e.priority, e.crawl_depth,
                e.discovered_round, e.not_before_round,
            )
            for e in oracle.frontier_by_round[r]
        )
        assert got == exp, f"frontier mismatch after round {r}"


def test_recrawl_resume_bit_identical(spark):
    seeds = fixtures.seed_urls()
    seeds_df = spark.createDataFrame([(u,) for u in seeds], SEEDS)
    a, b = CKPT + "-a", CKPT + "-b"

    shutil.rmtree(a, ignore_errors=True)
    st_a = rnd.init_crawl(spark, seeds_df, CFG, SPEC, ckpt=a)
    rnd.run_crawl(st_a, max_rounds=6)

    shutil.rmtree(b, ignore_errors=True)
    st_b = rnd.init_crawl(spark, seeds_df, CFG, SPEC, ckpt=b)
    rnd.run_crawl(st_b, max_rounds=3)
    del st_b
    st_b2 = rnd.resume(spark, b, CFG, SPEC)
    assert st_b2.next_round == 4
    rnd.run_crawl(st_b2, max_rounds=6)

    def outputs(st):
        order = [
            (r["round"], r["seq"], r["url"])
            for r in rnd.read_crawl_order(st, 6).collect()
        ]
        seen = sorted(
            (r["url_hash"], r["url"])
            for r in rnd.read_final_seen(st, 6).collect()
        )
        state = sorted(
            tuple(r) for r in st.store.read(6, "recrawl_state").collect()
        )
        return order, seen, state

    assert outputs(st_a) == outputs(st_b2)
