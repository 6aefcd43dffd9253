"""Opt-in content-seen dedup (CrawlConfig.content_dedup): docs whose span
fingerprint was already sighted are recorded in the documents sink but
never expand the frontier — full engine ⇔ oracle equality over a mirror-
bearing universe (FetchSpec.mirror_mod plants byte-identical span arrays
under different URLs), plus non-vacuity, counter/lineage checks, and
run+resume exactness across the content_seen state table."""

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

ROUNDS = 3
CKPT = "/tmp/crawlspark-test-cdedup"
SPEC = FetchSpec(mirror_mod=3)
CFG = CrawlConfig(content_dedup=True)


def test_mirror_universe_deterministic_and_gated():
    # flag off: byte-identical to the default universe
    for k in range(40):
        u = f"http://h{k % 7}.example/p/{k}"
        assert fs.simulate_fetch(u, FetchSpec()) == fs.simulate_fetch(
            u, FetchSpec(mirror_mod=0)
        )
    # flag on: mirrors of the same key share an identical span array
    spec = SPEC
    by_seed = {}
    for k in range(400):
        u = f"http://h{k % 7}.example/p/{k}"
        seed = fs.mirror_seed_of(u, spec)
        if seed is None:
            continue
        status, spans = fs.simulate_fetch(u, spec)
        if status != 200:
            continue
        if seed in by_seed:
            assert spans == by_seed[seed]
        by_seed[seed] = spans
    assert len(by_seed) > 5, "mirror universe too sparse to bind"


@pytest.fixture(scope="module")
def cd_pair(spark):
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=CKPT,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, CFG, SPEC, max_rounds=ROUNDS)
    return st, infos, oracle


def test_cd_crawl_order_equality(cd_pair):
    st, _, oracle = cd_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order


def test_cd_seen_set_equality(cd_pair):
    st, _, oracle = cd_pair
    got = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert got == oracle.seen


def test_cd_counters_lineage_and_nonvacuous(cd_pair):
    st, infos, oracle = cd_pair
    assert [
        (i["round"], i["selected"], i["new"], i["frontier"], i["content_dups"])
        for i in infos
    ] == [
        (o["round"], o["selected"], o["new"], o["frontier"], o["content_dups"])
        for o in oracle.rounds
    ]
    assert sum(i["content_dups"] for i in infos) > 0, "dedup never bound"
    for i in infos:
        rows = (
            st.store.read(i["round"], "lineage")
            .filter("stage = 'content_dups'")
            .collect()
        )
        assert len(rows) == 1 and rows[0]["rows"] == i["content_dups"]


def test_cd_content_table_matches_oracle(cd_pair):
    """The accumulated content_seen table IS the oracle's fingerprint map:
    same digests, same first-sighting URL."""
    st, _, oracle = cd_pair
    got = {
        r["content_hash"]: r["url"]
        for r in st.store.read_all("content_seen", ROUNDS).collect()
    }
    assert got == oracle.content_seen


def test_cd_suppression_reduces_expansion(cd_pair):
    """Same universe without the flag must discover at least as many URLs
    — and strictly more when mirrors exist (the suppressed links)."""
    _, infos, _ = cd_pair
    base = simulate(
        fixtures.seed_urls(), CrawlConfig(), SPEC, max_rounds=ROUNDS
    )
    assert sum(o["new"] for o in base.rounds) > sum(i["new"] for i in infos)


def test_cd_resume_exactness(spark, cd_pair):
    """Crash after round 1 + resume must reproduce the straight-through
    crawl bit-for-bit (content_seen chains across the restart)."""
    st, infos, _ = cd_pair
    ckpt2 = CKPT + "-resume"
    shutil.rmtree(ckpt2, ignore_errors=True)
    seeds = fixtures.seed_urls()
    st2 = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=ckpt2,
    )
    rnd.run_crawl(st2, max_rounds=1)
    st3 = rnd.resume(spark, ckpt2, CFG, SPEC)
    infos2 = rnd.run_crawl(st3, max_rounds=ROUNDS)
    assert [
        (i["round"], i["selected"], i["new"], i["frontier"], i["content_dups"])
        for i in infos[1:]
    ] == [
        (i["round"], i["selected"], i["new"], i["frontier"], i["content_dups"])
        for i in infos2
    ]
    a = {r["url_hash"] for r in rnd.read_final_seen(st).collect()}
    b = {r["url_hash"] for r in rnd.read_final_seen(st3).collect()}
    assert a == b
