"""J1 two-tier seen filtering: bloom-prefiltered result must equal the
plain exact anti-join (exactness is unconditional), and the observed
Bloom FPP stays near target (J6 FP-audit, SURVEY.md §3.3)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawlspark import seen as seen_mod
from crawlspark.bloom import BloomRegistry
from crawlspark.config import CrawlConfig
from crawlspark.xxh64 import hash_str


@pytest.fixture(scope="module")
def data(spark):
    cfg = CrawlConfig(n_buckets=16, bloom_capacity_per_bucket=4096)
    seen_rows = []
    reg = BloomRegistry(fpp=cfg.bloom_fpp, initial_capacity=cfg.bloom_capacity_per_bucket)
    by_bucket = {}
    for i in range(5000):
        url = f"http://s{i % 40}.example/seen/{i}"
        uh = hash_str(url)
        b = uh % cfg.n_buckets
        seen_rows.append((uh, url, b))
        by_bucket.setdefault(b, []).append(uh)
    for b, hashes in by_bucket.items():
        reg.get(b).add(np.array(hashes, dtype=np.int64))
    cand_rows = []
    for i in range(3000):  # half overlap with seen
        if i % 2 == 0:
            url = f"http://s{i % 40}.example/seen/{i}"
        else:
            url = f"http://s{i % 40}.example/new/{i}"
        uh = hash_str(url)
        cand_rows.append((url, uh, uh % cfg.n_buckets))
    seen_df = spark.createDataFrame(seen_rows, "url_hash long, url string, bucket int")
    cands = spark.createDataFrame(cand_rows, "url string, url_hash long, bucket int")
    return cfg, reg, seen_df, cands


def test_bloom_filtered_equals_exact(spark, data):
    cfg, reg, seen_df, cands = data
    bcast = spark.sparkContext.broadcast(reg.broadcast_payload())
    with_bloom = seen_mod.filter_new(cands, seen_df, bcast, cfg)
    without = seen_mod.filter_new(
        cands, seen_df, None, cfg.with_(use_bloom_prefilter=False)
    )
    a = sorted(r["url_hash"] for r in with_bloom.collect())
    b = sorted(r["url_hash"] for r in without.collect())
    assert a == b
    # ground truth
    seen_set = {r["url_hash"] for r in seen_df.collect()}
    want = sorted(r["url_hash"] for r in cands.collect() if r["url_hash"] not in seen_set)
    assert a == want


def test_fp_audit_rate(spark, data):
    """J6: rows bloom flags 'maybe seen' that the exact table disproves."""
    cfg, reg, seen_df, cands = data
    bcast = spark.sparkContext.broadcast(reg.broadcast_payload())
    probe = seen_mod.maybe_seen_udf(bcast)
    flagged = cands.withColumn("maybe", probe(F.col("bucket"), F.col("url_hash")))
    maybe = flagged.filter(F.col("maybe"))
    fp = maybe.join(seen_df.select("url_hash"), "url_hash", "left_anti").count()
    true_new = cands.join(seen_df.select("url_hash"), "url_hash", "left_anti").count()
    observed_fpp = fp / max(true_new, 1)
    assert observed_fpp < 3 * cfg.bloom_fpp, observed_fpp
    # and zero false negatives: every truly-seen row must be flagged
    missed = flagged.filter(~F.col("maybe")).join(
        seen_df.select("url_hash"), "url_hash", "left_semi"
    ).count()
    assert missed == 0


def test_seen_compaction_bounds_union_fanin(spark):
    """compact_seen_every (DEFAULT 8) must keep read_seen's union bounded:
    after a long crawl the read is one compacted snapshot + at most
    `every` delta dirs — never one dir per round since round 0 — and the
    compacted read stays value-equal to the raw delta union."""
    import shutil

    from crawlspark import fixtures
    from crawlspark import round as rnd
    from crawlspark.config import CrawlConfig
    from crawlspark.fetch_spec import FetchSpec
    from crawlspark.schemas import SEEDS

    every = 3
    rounds = 8
    cfg = CrawlConfig(compact_seen_every=every, compact_frontier_every=3)
    ckpt = "/tmp/crawlspark-test-seen-compact"
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark,
        spark.createDataFrame([(u,) for u in fixtures.seed_urls()], SEEDS),
        cfg, FetchSpec(), ckpt=ckpt,
    )
    rnd.run_crawl(st, max_rounds=rounds)
    store = st.store
    last = st.next_round - 1

    c = store.last_compaction(last)
    assert c is not None and c >= last - every, (c, last)
    n_delta_dirs = sum(
        1 for r in range(c + 1, last + 1) if store.exists(r, "seen_delta")
    )
    assert n_delta_dirs <= every
    assert store.exists(c, "seen_full")

    # value equality: compacted read == raw union of every delta dir
    got = sorted(
        (r["url_hash"], r["url"], r["bucket"])
        for r in store.read_seen(last).collect()
    )
    raw_dirs = [
        f"{ckpt}/round={r}/seen_delta"
        for r in range(0, last + 1)
        if store.exists(r, "seen_delta")
    ]
    raw = sorted(
        (r["url_hash"], r["url"], r["bucket"])
        for r in spark.read.parquet(*raw_dirs).collect()
    )
    assert got == raw


def test_candidate_chain_shares_one_bucket_exchange(spark):
    """Round-8 plan contract (guide §2.4): the candidate pipeline —
    fused parse pass → (bucket, url_hash) dedup → exact anti-join
    against seen → bucket-clustered seen_delta projection — keys
    everything off ONE explicit bucket repartition of the candidates.
    With spark.sql.requireAllClusterKeysForCoPartition=false (set by
    init_crawl/resume; bucket = url_hash mod P is uniform, so the skew
    guard the default protects against cannot occur), the plan carries
    exactly TWO exchanges: the candidates' bucket repartition and the
    seen side's co-partitioning — the round-7 shape re-shuffled the
    candidates a second time for the url_hash-keyed join. The join
    stays ShuffledHashJoin BuildRight (nothing corpus-derived is
    broadcast)."""
    from crawlspark import candidates as cand_mod
    from crawlspark.schemas import DOCUMENTS

    cfg = CrawlConfig()
    old = spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition", None)
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", None)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    # AQE off for a deterministic static plan (the bench config; under
    # AQE the same exchange appears once per consumer pre-execution and
    # dedupes only at runtime via stage reuse)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rows = [
            (
                f"doc{i}",
                f"http://h{i % 5}.example/p{i}",
                1,
                200,
                [
                    {"kind": "link", "text": None, "media_ref": f"/x{j}", "offset": j}
                    for j in range(3)
                ],
                0,
                0,
            )
            for i in range(50)
        ]
        docs = spark.createDataFrame(rows, DOCUMENTS)
        seen_df = spark.createDataFrame(
            [(i * 7919, f"u{i}", (i * 7919) % cfg.n_buckets) for i in range(100)],
            "url_hash long, url string, bucket int",
        )
        cands = cand_mod.candidate_rows(docs, cfg, None, None)
        new = cand_mod.split_new(cands, seen_df, n_buckets=cfg.n_buckets)
        out = new.select("url_hash", "url", "bucket").sortWithinPartitions("url_hash")
        plan = out._jdf.queryExecution().executedPlan().toString()
        exchanges = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln and "Reused" not in ln
        ]
        assert len(exchanges) == 2, plan
        assert "ShuffledHashJoin" in plan and "BuildRight" in plan, plan
        assert "BroadcastExchange" not in plan, plan
    finally:
        if old is None:
            spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
        else:
            spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.enabled")
        else:
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
