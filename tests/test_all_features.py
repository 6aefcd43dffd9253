"""The everything-on crawl: every opt-in crawl feature enabled
SIMULTANEOUSLY over a universe that exercises them all (redirects,
mirrors, transient 503s, media extensions, round-churning content) —
full engine ⇔ oracle equality plus run+resume exactness. Features tested
pairwise elsewhere; this is the composition proof: admission quotas over
quality-filtered candidates from redirect-following retried fetches of
mirror-deduped content under adaptive politeness, boosts, priority
aging, closed-loop recrawl re-enqueues, conditional-refetch (304)
revalidation, and per-IP politeness caps — with recrawl_state on the
round-7 merge-on-read DELTA engine (compaction mid-run) so the delta
chain is proven under the full composition, resume included."""

import shutil

import pytest

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 6
CKPT = "/tmp/crawlspark-test-allfeat"
CFG = CrawlConfig(
    adaptive_politeness=True,
    url_quality_filter=True,
    content_dedup=True,
    fetch_retries=2,
    host_page_quota=6,
    priority_aging_every=2,
    host_boosts=(("h1.example", -1), ("h3.example", 1)),
    recrawl_every=2,
    recrawl_interval=2,
    conditional_fetch=True,
    ip_politeness_groups=3,
    ip_budget=10,
    # round-7: run the composition on the DELTA recrawl_state engine
    # (merge-on-read + compaction under every other feature at once;
    # engine equivalence is proven pairwise in tests/test_recrawl_delta.py)
    recrawl_delta=True,
    compact_recrawl_every=3,
)
SPEC = FetchSpec(
    media_exts=True, redirect_mod=7, mirror_mod=4, error_mod=6, change_mod=5
)

COUNTERS = (
    "selected", "new", "frontier", "url_filtered", "content_dups",
    "retry_queue", "quota_dropped", "recrawled", "not_modified",
    "ip_capped",
)


@pytest.fixture(scope="module")
def all_pair(spark):
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=CKPT,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, CFG, SPEC, max_rounds=ROUNDS)
    return st, infos, oracle


def test_allfeat_crawl_order_equality(all_pair):
    st, _, oracle = all_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order


def test_allfeat_seen_set_equality(all_pair):
    st, _, oracle = all_pair
    got = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert got == oracle.seen


def test_allfeat_all_counters_equal_and_nonvacuous(all_pair):
    _, infos, oracle = all_pair
    assert [tuple(i[c] for c in COUNTERS) for i in infos] == [
        tuple(o[c] for c in COUNTERS) for o in oracle.rounds
    ]
    # every feature must actually BIND in this universe, or the
    # composition proof is weaker than it claims
    totals = {c: sum(i[c] for i in infos) for c in COUNTERS}
    assert totals["url_filtered"] > 0, "quality filter never bound"
    assert totals["content_dups"] > 0, "content dedup never bound"
    assert totals["retry_queue"] > 0, "no retry ever queued"
    assert totals["quota_dropped"] > 0, "quota never bound"
    assert totals["recrawled"] > 0, "recrawl never re-enqueued"
    assert totals["not_modified"] > 0, "revalidation never produced a 304"
    assert totals["ip_capped"] > 0, "IP-group cap never bound"


def test_allfeat_resume_exactness(spark, all_pair):
    st, infos, _ = all_pair
    ckpt2 = CKPT + "-resume"
    shutil.rmtree(ckpt2, ignore_errors=True)
    seeds = fixtures.seed_urls()
    st2 = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=ckpt2,
    )
    rnd.run_crawl(st2, max_rounds=3)
    st3 = rnd.resume(spark, ckpt2, CFG, SPEC)
    infos2 = rnd.run_crawl(st3, max_rounds=ROUNDS)
    assert [tuple(i[c] for c in COUNTERS) for i in infos[3:]] == [
        tuple(i[c] for c in COUNTERS) for i in infos2
    ]
    a = {r["url_hash"] for r in rnd.read_final_seen(st).collect()}
    b = {r["url_hash"] for r in rnd.read_final_seen(st3).collect()}
    assert a == b
