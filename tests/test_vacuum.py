"""Checkpoint vacuum (SnapshotStore.vacuum — the Iceberg expire_snapshots
analog): superseded state directories are deleted, and a crawl vacuumed
mid-way then resumed reproduces the un-vacuumed straight-through run
bit-for-bit under both frontier engines."""

import os
import shutil

import pytest

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS

ROUNDS_A = 4
ROUNDS_B = 8
SPEC = FetchSpec()


def _run(spark, ckpt, cfg, upto, init=True):
    seeds = fixtures.seed_urls()
    if init:
        shutil.rmtree(ckpt, ignore_errors=True)
        st = rnd.init_crawl(
            spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg,
            SPEC, ckpt=ckpt,
        )
    else:
        st = rnd.resume(spark, ckpt, cfg, SPEC)
    rnd.run_crawl(st, max_rounds=upto)
    return st


def _final(st):
    order = [
        (r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()
    ]
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    return order, seen


@pytest.mark.parametrize(
    "cfg",
    [
        CrawlConfig(compact_seen_every=2),
        CrawlConfig(compact_seen_every=2, frontier_delta=True,
                    compact_frontier_every=2),
    ],
    ids=["stored", "delta"],
)
def test_vacuum_then_resume_bit_identical(spark, cfg):
    base = f"/tmp/crawlspark-test-vacuum-{id(cfg) % 97}"
    st_a = _run(spark, base + "-a", cfg, ROUNDS_B)
    ref = _final(st_a)

    st_b = _run(spark, base + "-b", cfg, ROUNDS_A)
    report = st_b.store.vacuum()
    assert report["removed"], "vacuum removed nothing — test is vacuous"
    # superseded seen deltas are gone, the compaction snapshot is not
    assert any("seen_delta" in p for p in report["removed"])
    st_b2 = rnd.resume(spark, base + "-b", cfg, SPEC)
    rnd.run_crawl(st_b2, max_rounds=ROUNDS_B)
    assert _final(st_b2) == ref


def test_vacuum_preserves_outputs(spark):
    cfg = CrawlConfig(compact_seen_every=2)
    ckpt = "/tmp/crawlspark-test-vacuum-out"
    st = _run(spark, ckpt, cfg, ROUNDS_A)
    n_docs_before = st.store.read_all("documents", ROUNDS_A).count()
    st.store.vacuum()
    assert st.store.read_all("documents", ROUNDS_A).count() == n_docs_before
    for r in range(1, ROUNDS_A + 1):
        assert st.store.exists(r, "crawl_order")
        assert st.store.exists(r, "lineage")
    assert st.store.read_manifest()["vacuumed_upto"] == ROUNDS_A
