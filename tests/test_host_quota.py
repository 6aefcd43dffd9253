"""Opt-in per-host page quota (CrawlConfig.host_page_quota): frontier
admission control — once a host has accumulated `quota` seen pages,
further discovered candidates drop deterministically (per-round per-host
rank by (priority, depth, url_hash, url), quota-remaining survive). Full
engine ⇔ oracle equality, the quota bound on the final seen set, and
run+resume exactness across the host_counts chain."""

import shutil

import pytest
from pyspark.sql import functions as F

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from crawlspark.xxh64 import hash_str
from oracle.simulator import simulate

ROUNDS = 4
CKPT = "/tmp/crawlspark-test-quota"
QUOTA = 3
CFG = CrawlConfig(host_page_quota=QUOTA)
SPEC = FetchSpec()


@pytest.fixture(scope="module")
def quota_pair(spark):
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=CKPT,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, CFG, SPEC, max_rounds=ROUNDS)
    return st, infos, oracle


def test_quota_crawl_order_equality(quota_pair):
    st, _, oracle = quota_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order


def test_quota_seen_set_equality_and_bound(quota_pair):
    st, _, oracle = quota_pair
    got = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert got == oracle.seen
    # the cap binds: every host's seen count <= quota + its seed count
    # (seeds are exempt but count toward usage)
    seeds = fixtures.seed_urls()
    from crawlspark import urlnorm

    seed_hosts = {}
    for u in seeds:
        h = urlnorm.host_of(urlnorm.canon_url(u))
        seed_hosts[h] = seed_hosts.get(h, 0) + 1
    per_host = {}
    for url in got.values():
        h = urlnorm.host_of(url)
        per_host[h] = per_host.get(h, 0) + 1
    for h, n in per_host.items():
        assert n <= max(QUOTA, seed_hosts.get(h, 0)), (h, n)


def test_quota_counters_lineage_and_nonvacuous(quota_pair):
    st, infos, oracle = quota_pair
    assert [
        (i["round"], i["selected"], i["new"], i["frontier"], i["quota_dropped"])
        for i in infos
    ] == [
        (o["round"], o["selected"], o["new"], o["frontier"], o["quota_dropped"])
        for o in oracle.rounds
    ]
    assert sum(i["quota_dropped"] for i in infos) > 0, "quota never bound"
    for i in infos:
        rows = (
            st.store.read(i["round"], "lineage")
            .filter("stage = 'quota_dropped'")
            .collect()
        )
        assert len(rows) == 1 and rows[0]["rows"] == i["quota_dropped"]


def test_quota_smaller_than_unbounded(quota_pair):
    _, infos, _ = quota_pair
    base = simulate(fixtures.seed_urls(), CrawlConfig(), SPEC, max_rounds=ROUNDS)
    assert sum(o["new"] for o in base.rounds) > sum(i["new"] for i in infos)


def test_quota_resume_exactness(spark, quota_pair):
    st, infos, _ = quota_pair
    ckpt2 = CKPT + "-resume"
    shutil.rmtree(ckpt2, ignore_errors=True)
    seeds = fixtures.seed_urls()
    st2 = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=ckpt2,
    )
    rnd.run_crawl(st2, max_rounds=2)
    st3 = rnd.resume(spark, ckpt2, CFG, SPEC)
    infos2 = rnd.run_crawl(st3, max_rounds=ROUNDS)
    assert [
        (i["round"], i["selected"], i["new"], i["frontier"], i["quota_dropped"])
        for i in infos[2:]
    ] == [
        (i["round"], i["selected"], i["new"], i["frontier"], i["quota_dropped"])
        for i in infos2
    ]
    a = {r["url_hash"] for r in rnd.read_final_seen(st).collect()}
    b = {r["url_hash"] for r in rnd.read_final_seen(st3).collect()}
    assert a == b
