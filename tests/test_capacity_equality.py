"""Engine ⇔ oracle equality when the GLOBAL round capacity K binds
(O3 — the emission-order prefix semantics of SPEC.md §4)."""

import shutil

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate


def test_binding_round_capacity(spark):
    cfg = CrawlConfig(round_capacity=13)
    spec = FetchSpec()
    seeds = fixtures.seed_urls()
    ckpt = "/tmp/crawlspark-test-capk"
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg, spec, ckpt=ckpt
    )
    infos = rnd.run_crawl(st, max_rounds=2)
    oracle = simulate(seeds, cfg, spec, max_rounds=2)
    assert all(i["selected"] == 13 for i in infos)
    got = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()]
    assert got == oracle.crawl_order
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert seen == oracle.seen
