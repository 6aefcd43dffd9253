"""Opt-in per-IP politeness (CrawlConfig.ip_politeness_groups): after
per-host selection, hosts hash into N IP groups (virtual-hosting model)
and each group keeps at most ip_budget rows per round, best-rank-first
across its hosts. Engine ⇔ oracle equality (order, seen, ip_capped
counter), non-vacuity (the cap binds; multiple hosts share groups), unit
semantics of rank.ip_cap, and run+resume exactness."""

import shutil

import pytest
from pyspark.sql import functions as F

from crawlspark import fixtures, rank
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from crawlspark.xxh64 import hash_str
from oracle.simulator import simulate

ROUNDS = 4
CKPT = "/tmp/crawlspark-test-ippol"
SPEC = FetchSpec()
CFG = CrawlConfig(ip_politeness_groups=3, ip_budget=4)


def test_ip_group_col_matches_python_xxh64(spark):
    hhs = [hash_str(f"h{k}.example") for k in range(40)]
    df = spark.createDataFrame([(h,) for h in hhs], "host_hash long")
    got = {
        r["host_hash"]: r["g"]
        for r in df.select(
            "host_hash", rank.ip_group_col(7).alias("g")
        ).collect()
    }
    for h in hhs:
        assert got[h] == hash_str(f"{h}#ip") % 7


def test_ip_cap_unit_semantics(spark):
    # 3 hosts, all in one forced group (n_groups=1): budget shared
    # best-rank-first ACROSS hosts, not first-host-takes-all
    rows = [
        (f"http://h{h}.example/p/{i}", hash_str(f"http://h{h}.example/p/{i}"),
         hash_str(f"h{h}.example"), i + 1)
        for h in range(3)
        for i in range(3)
    ]
    df = spark.createDataFrame(
        rows, "url string, url_hash long, host_hash long, rank int"
    )
    # the docstring's scale claim is real: the rank<=budget filter
    # compiles to a WindowGroupLimit (per-partition pre-trim below the
    # exchange)
    plan = (
        rank.ip_cap(df, n_groups=1, budget=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan

    kept = rank.ip_cap(df, n_groups=1, budget=4, keep_group_col=True).collect()
    assert len(kept) == 4
    assert {r["ip_group"] for r in kept} == {0}
    # rank-1 rows of ALL three hosts survive before any rank-2 row
    ranks = sorted(r["rank"] for r in kept)
    assert ranks == [1, 1, 1, 2]
    # deterministic 4th pick: the rank-2 row of the smallest host_hash
    h2 = [r["host_hash"] for r in kept if r["rank"] == 2]
    assert h2 == [min(hash_str(f"h{h}.example") for h in range(3))]


@pytest.fixture(scope="module")
def ip_pair(spark):
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=CKPT,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, CFG, SPEC, max_rounds=ROUNDS)
    return st, infos, oracle


def test_ip_crawl_matches_oracle(ip_pair):
    st, infos, oracle = ip_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order
    assert [(i["round"], i["selected"], i["ip_capped"]) for i in infos] == [
        (o["round"], o["selected"], o["ip_capped"]) for o in oracle.rounds
    ]
    # non-vacuity: the cap actually dropped rows, and a group held >1 host
    assert sum(i["ip_capped"] for i in infos) > 0
    hosts = {u.split("/")[2] for _r, _s, u in got}
    groups = {}
    for h in hosts:
        groups.setdefault(
            hash_str(f"{hash_str(h)}#ip") % CFG.ip_politeness_groups, set()
        ).add(h)
    assert max(len(v) for v in groups.values()) > 1
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert seen == oracle.seen


def test_ip_nonbinding_counter_is_zero(spark):
    # regression: the post-cap count used to ride an Observation above the
    # ip_cap window shuffle, which with_seq's range-sampling job
    # double-counts — a never-binding cap reported ip_capped = -selected
    # on the CLI path. With a huge budget the cap must be a provable
    # no-op: counter exactly 0 every round and output equal to flag-off.
    seeds = fixtures.seed_urls()
    seeds_df = spark.createDataFrame([(u,) for u in seeds], SEEDS)
    cfg_loose = CrawlConfig(ip_politeness_groups=3, ip_budget=10**6)

    ck_on, ck_off = CKPT + "-nb-on", CKPT + "-nb-off"
    shutil.rmtree(ck_on, ignore_errors=True)
    st_on = rnd.init_crawl(spark, seeds_df, cfg_loose, SPEC, ckpt=ck_on)
    infos = rnd.run_crawl(st_on, max_rounds=2)
    assert [i["ip_capped"] for i in infos] == [0, 0]

    shutil.rmtree(ck_off, ignore_errors=True)
    st_off = rnd.init_crawl(spark, seeds_df, CrawlConfig(), SPEC, ckpt=ck_off)
    rnd.run_crawl(st_off, max_rounds=2)
    order = lambda st: [  # noqa: E731
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st, 2).collect()
    ]
    assert order(st_on) == order(st_off)


def test_ip_resume_bit_identical(spark):
    seeds = fixtures.seed_urls()
    seeds_df = spark.createDataFrame([(u,) for u in seeds], SEEDS)
    a, b = CKPT + "-a", CKPT + "-b"

    shutil.rmtree(a, ignore_errors=True)
    st_a = rnd.init_crawl(spark, seeds_df, CFG, SPEC, ckpt=a)
    rnd.run_crawl(st_a, max_rounds=ROUNDS)

    shutil.rmtree(b, ignore_errors=True)
    st_b = rnd.init_crawl(spark, seeds_df, CFG, SPEC, ckpt=b)
    rnd.run_crawl(st_b, max_rounds=2)
    del st_b
    st_b2 = rnd.resume(spark, b, CFG, SPEC)
    assert st_b2.next_round == 3
    rnd.run_crawl(st_b2, max_rounds=ROUNDS)

    def outputs(st):
        order = [
            (r["round"], r["seq"], r["url"])
            for r in rnd.read_crawl_order(st, ROUNDS).collect()
        ]
        seen = sorted(
            (r["url_hash"], r["url"])
            for r in rnd.read_final_seen(st, ROUNDS).collect()
        )
        return order, seen

    assert outputs(st_a) == outputs(st_b2)
