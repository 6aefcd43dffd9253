"""Opt-in pre-fetch URL quality filter (CrawlConfig.url_quality_filter):
engine ⇔ oracle equality with the flag ON, over a fetch universe that
actually contains filterable URLs (FetchSpec.media_exts=True plants media
extensions on image/video refs and a blocklisted prefix on ~1/17 links).
The filter drops candidates after canon/robots/dedup, before the seen
anti-join — mirrored at the same stage in oracle/simulator.py — and its
per-round drop count lands in lineage (stage='url_filtered') and in the
committed round_info."""

import shutil

import pytest

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from crawlspark.textops import url_quality_keep_py
from oracle.simulator import simulate

ROUNDS = 3
CKPT = "/tmp/crawlspark-test-uq"


@pytest.fixture(scope="module")
def uq_pair(spark):
    cfg = CrawlConfig(url_quality_filter=True)
    spec = FetchSpec(media_exts=True)
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg, spec,
        ckpt=CKPT,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, cfg, spec, max_rounds=ROUNDS)
    return st, infos, oracle


def test_uq_crawl_order_equality(uq_pair):
    st, _, oracle = uq_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order


def test_uq_seen_set_equality_and_filter_binds(uq_pair):
    st, _, oracle = uq_pair
    got = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert got == oracle.seen
    # non-vacuous: every surviving URL passes the predicate, and the flag
    # actually removed something vs the same universe unfiltered
    assert all(url_quality_keep_py(u) for u in got.values())
    unfiltered = simulate(
        fixtures.seed_urls(), CrawlConfig(), FetchSpec(media_exts=True),
        max_rounds=ROUNDS,
    )
    dropped = {u for u in unfiltered.seen.values() if not url_quality_keep_py(u)}
    assert dropped, "universe must contain filterable URLs"
    assert not dropped & set(got.values())


def test_uq_counters_and_lineage(uq_pair):
    st, infos, oracle = uq_pair
    assert [
        (i["round"], i["selected"], i["new"], i["frontier"], i["url_filtered"])
        for i in infos
    ] == [
        (o["round"], o["selected"], o["new"], o["frontier"], o["url_filtered"])
        for o in oracle.rounds
    ]
    assert sum(i["url_filtered"] for i in infos) > 0, "filter never bound"
    for i in infos:
        r = i["round"]
        rows = (
            st.store.read(r, "lineage")
            .filter("stage = 'url_filtered'")
            .collect()
        )
        assert len(rows) == 1 and rows[0]["rows"] == i["url_filtered"]
    # manifest carries the counter too (exact resume surface)
    ri = st.store.read_manifest()["round_info"]
    for i in infos:
        assert ri[str(i["round"])]["url_filtered"] == i["url_filtered"]
