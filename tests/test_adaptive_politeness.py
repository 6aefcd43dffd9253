"""Adaptive per-host politeness (VERDICT r01 missing #5, opt-in): backoff
multipliers derived from observed fetch outcomes, engine ≡ oracle."""

import shutil

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 4
# not_found_mod=2 -> ~half of all fetches 404 -> hosts trip the >=50%-error
# rule and accumulate multipliers, exercising double/halve/carry paths
SPEC = FetchSpec(not_found_mod=2)
CFG = CrawlConfig(adaptive_politeness=True)


def test_adaptive_engine_matches_oracle(spark):
    ckpt = "/tmp/crawlspark-test-adaptive"
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC, ckpt=ckpt
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, CFG, SPEC, max_rounds=ROUNDS)

    got = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()]
    assert got == oracle.crawl_order
    assert [(i["round"], i["selected"], i["new"], i["frontier"]) for i in infos] == [
        (o["round"], o["selected"], o["new"], o["frontier"]) for o in oracle.rounds
    ]
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert seen == oracle.seen

    # the feature actually engaged: some host carries a multiplier > 1
    states = []
    for r in range(1, st.next_round):
        if st.store.exists(r, "host_state"):
            states += st.store.read(r, "host_state").collect()
    assert any(s["mult"] > 1 for s in states), "no host ever backed off"
    assert all(1 < s["mult"] <= CFG.adaptive_max_mult for s in states)


def test_adaptive_changes_schedule_vs_static(spark):
    """With heavy errors the adaptive crawl must actually defer more /
    select fewer than the static one (otherwise the knob is dead code)."""
    seeds = fixtures.seed_urls()
    static = simulate(seeds, CrawlConfig(), SPEC, max_rounds=ROUNDS)
    adaptive = simulate(seeds, CFG, SPEC, max_rounds=ROUNDS)
    assert static.crawl_order != adaptive.crawl_order
    sel_static = sum(r["selected"] for r in static.rounds)
    sel_adapt = sum(r["selected"] for r in adaptive.rounds)
    assert sel_adapt <= sel_static
