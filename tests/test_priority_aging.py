"""Opt-in priority aging (CrawlConfig.priority_aging_every): a pending
URL's EFFECTIVE scheduling priority improves by 1 per K rounds waited
since discovery — starvation freedom for budget-capped backlogs. Engine ⇔
oracle equality with the flag on, divergence from the un-aged schedule
(non-vacuity), and proof the stored base priority never compounds."""

import shutil

import pytest

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 6
CKPT = "/tmp/crawlspark-test-aging"
# a tight per-host budget builds the multi-round backlog aging acts on
CFG = CrawlConfig(priority_aging_every=2, max_fetches_per_host_per_round=1)
SPEC = FetchSpec()


@pytest.fixture(scope="module")
def aging_pair(spark):
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=CKPT,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, CFG, SPEC, max_rounds=ROUNDS)
    return st, infos, oracle


def test_aging_crawl_order_equality(aging_pair):
    st, _, oracle = aging_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order


def test_aging_seen_set_equality(aging_pair):
    st, _, oracle = aging_pair
    got = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert got == oracle.seen


def test_aging_changes_the_schedule(aging_pair):
    """Non-vacuity: under the same tight budget, the aged schedule must
    differ from the un-aged one (otherwise the flag tested nothing)."""
    _, _, oracle = aging_pair
    base = simulate(
        fixtures.seed_urls(),
        CrawlConfig(max_fetches_per_host_per_round=1),
        SPEC,
        max_rounds=ROUNDS,
    )
    assert base.crawl_order != oracle.crawl_order


def test_aging_never_persists(aging_pair):
    """The frontier stores BASE priorities: every stored priority must be
    one a candidate can legitimately carry (seed 0, or parent+1/+2 chains
    >= 0) — an aged (negative/compounded) value leaking into state would
    show up here."""
    st, _, oracle = aging_pair
    rows = st.store.read_frontier(ROUNDS).select("url_hash", "priority").collect()
    by_hash = {e.url_hash: e.priority for e in oracle.frontier_by_round[ROUNDS]}
    for row in rows:
        assert row["priority"] == by_hash[row["url_hash"]]
        assert row["priority"] >= 0
