"""Exact-resume equality (SURVEY.md §4.2, BASELINE.json "checkpoint frontier
+ seen-set state ... for exact resume"): rounds 1..4 straight-through must
be bit-identical to 1..2, kill, resume, 3..4 — including the Bloom
registry rebuilt from its snapshot rows."""

import shutil

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS

A = "/tmp/crawlspark-test-resume-a"
B = "/tmp/crawlspark-test-resume-b"


def _collect_outputs(st, upto):
    order = [
        (r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st, upto).collect()
    ]
    seen = sorted(
        (r["url_hash"], r["url"]) for r in rnd.read_final_seen(st, upto).collect()
    )
    frontier = sorted(
        (r["url"], r["not_before_round"])
        for r in rnd.read_frontier_view(st, upto).collect()
    )
    return order, seen, frontier


def test_resume_bit_identical(spark):
    cfg = CrawlConfig()
    spec = FetchSpec()
    seeds = fixtures.seed_urls()
    seeds_df = spark.createDataFrame([(u,) for u in seeds], SEEDS)

    shutil.rmtree(A, ignore_errors=True)
    st_a = rnd.init_crawl(spark, seeds_df, cfg, spec, ckpt=A)
    rnd.run_crawl(st_a, max_rounds=4)

    shutil.rmtree(B, ignore_errors=True)
    st_b = rnd.init_crawl(spark, seeds_df, cfg, spec, ckpt=B)
    rnd.run_crawl(st_b, max_rounds=2)
    # simulate a crash: drop driver state entirely, resume from disk
    del st_b
    st_b2 = rnd.resume(spark, B, cfg, spec)
    assert st_b2.next_round == 3
    rnd.run_crawl(st_b2, max_rounds=4)

    st_a2 = rnd.resume(spark, A, cfg, spec)  # reread A through the same path
    assert _collect_outputs(st_a2, 4) == _collect_outputs(st_b2, 4)

    # bloom registries must also agree bit-for-bit after resume
    ra = {b: (f.m, f.k, f.n, f.bits.tobytes()) for b, f in st_a2.registry.filters.items()}
    rb = {b: (f.m, f.k, f.n, f.bits.tobytes()) for b, f in st_b2.registry.filters.items()}
    assert ra == rb


def test_crash_mid_round_resume(spark):
    """drop_rounds_after simulates a crash AFTER round 3 wrote partial state
    but before commit: resume must redo round 3 identically."""
    cfg = CrawlConfig()
    spec = FetchSpec()
    seeds = fixtures.seed_urls()
    seeds_df = spark.createDataFrame([(u,) for u in seeds], SEEDS)

    ck = "/tmp/crawlspark-test-resume-c"
    shutil.rmtree(ck, ignore_errors=True)
    st = rnd.init_crawl(spark, seeds_df, cfg, spec, ckpt=ck)
    rnd.run_crawl(st, max_rounds=3)
    ref = _collect_outputs(st, 3)

    st.store.drop_rounds_after(2)
    st2 = rnd.resume(spark, ck, cfg, spec)
    assert st2.next_round == 3
    rnd.run_crawl(st2, max_rounds=3)
    assert _collect_outputs(st2, 3) == ref
