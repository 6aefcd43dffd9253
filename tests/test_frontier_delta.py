"""Delta frontier engine (cfg.frontier_delta): per-round frontier IO is
O(batch) — removals + additions — with deferrals DERIVED from the constant
per-host delay instead of rewritten. Must be bit-equal to the oracle (and
hence to the stored-bump engine) on crawl order, counters, seen set, and
reconstructed frontier snapshots; resume-safe; physically delta-shaped."""

import os
import shutil

import pytest

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 5
CFG = CrawlConfig(frontier_delta=True, compact_frontier_every=3)


def _crawl(spark, cfg, ckpt, rounds=ROUNDS):
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg,
        FetchSpec(), ckpt=ckpt
    )
    infos = rnd.run_crawl(st, max_rounds=rounds)
    return st, infos


def test_delta_engine_matches_oracle(spark):
    ckpt = "/tmp/crawlspark-test-fdelta"
    st, infos = _crawl(spark, CFG, ckpt)
    oracle = simulate(fixtures.seed_urls(), CFG, FetchSpec(), max_rounds=ROUNDS)

    got = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()]
    assert got == oracle.crawl_order
    assert [(i["round"], i["selected"], i["new"], i["frontier"]) for i in infos] == [
        (o["round"], o["selected"], o["new"], o["frontier"]) for o in oracle.rounds
    ]
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert seen == oracle.seen

    # reconstructed frontier snapshot == oracle's stored-bump snapshot
    last = st.next_round - 1
    got_f = {
        r["url_hash"]: (r["url"], r["not_before_round"])
        for r in rnd.read_frontier_view(st, last).collect()
    }
    exp_f = {
        e.url_hash: (e.url, e.not_before_round)
        for e in oracle.frontier_by_round[last]
    }
    assert got_f == exp_f


def test_delta_engine_is_physically_delta(spark):
    from pyspark.sql import functions as F

    ckpt = "/tmp/crawlspark-test-fdelta2"
    st, infos = _crawl(spark, CFG, ckpt)
    # non-base rounds write ONE combined op-tagged delta and NO full frontier
    bases = set(st.store.frontier_bases())
    assert 0 in bases and 3 in bases  # compacted at compact_frontier_every
    for r in range(1, st.next_round):
        assert st.store.exists(r, "frontier_delta_rows")
        if r not in bases:
            assert not os.path.exists(
                os.path.join(ckpt, f"round={r}", "frontier", "_SUCCESS")
            )
        delta = st.store.read(r, "frontier_delta_rows")
        n_rem = delta.filter(F.col("op") == "del").count()
        n_add = delta.filter(F.col("op") == "add").count()
        assert n_rem == infos[r - 1]["selected"]
        assert n_add == infos[r - 1]["new"]


def test_delta_engine_reads_legacy_split_layout(spark):
    """A checkpoint written by the older split additions/removals layout
    must keep resuming: rewrite one round's combined dir into the legacy
    shape and re-read the chain."""
    import shutil as sh

    from pyspark.sql import functions as F

    ckpt = "/tmp/crawlspark-test-fdelta-legacy"
    st, _ = _crawl(spark, CFG, ckpt)
    last = st.next_round - 1
    target = None
    for r in range(1, last + 1):
        if r not in st.store.frontier_bases() and st.store.exists(r, "frontier_delta_rows"):
            target = r
            break
    assert target is not None
    before = sorted(
        (row["url_hash"], row["not_before_round"])
        for row in st.store.read_frontier(last).collect()
    )
    delta = st.store.read(target, "frontier_delta_rows")
    st.store.write(delta.filter(F.col("op") == "add").drop("op"), target, "frontier_additions")
    st.store.write(
        delta.filter(F.col("op") == "del").select("url_hash"), target, "frontier_removals"
    )
    sh.rmtree(os.path.join(ckpt, f"round={target}", "frontier_delta_rows"))
    after = sorted(
        (row["url_hash"], row["not_before_round"])
        for row in st.store.read_frontier(last).collect()
    )
    assert after == before


def test_delta_engine_resume_exact(spark):
    ck_a = "/tmp/crawlspark-test-fdelta-a"
    ck_b = "/tmp/crawlspark-test-fdelta-b"
    st_a, _ = _crawl(spark, CFG, ck_a, rounds=ROUNDS)
    st_b, _ = _crawl(spark, CFG, ck_b, rounds=2)
    st_b2 = rnd.resume(spark, ck_b, CFG, FetchSpec())
    rnd.run_crawl(st_b2, max_rounds=ROUNDS)
    oa = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_a).collect()]
    ob = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_b2, ROUNDS).collect()]
    assert oa == ob


def test_delta_adaptive_matches_oracle(spark):
    """Delta engine × adaptive politeness (VERDICT r02 #2): adapted hosts'
    diverged deferrals ride a sparse stored-exception table; everything else
    stays derived. Bit-equal to the oracle's stored-bump adaptive schedule,
    including the frontier snapshot reconstruction and a mid-run fold."""
    cfg = CrawlConfig(
        frontier_delta=True, adaptive_politeness=True, compact_frontier_every=3
    )
    spec = FetchSpec(not_found_mod=2)  # ~half the fetches 404 → mults trip
    ckpt = "/tmp/crawlspark-test-fdelta-adaptive"
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg, spec,
        ckpt=ckpt,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, cfg, spec, max_rounds=ROUNDS)

    got = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()]
    assert got == oracle.crawl_order
    assert [(i["round"], i["selected"], i["new"], i["frontier"]) for i in infos] == [
        (o["round"], o["selected"], o["new"], o["frontier"]) for o in oracle.rounds
    ]
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert seen == oracle.seen

    # the combination actually engaged: multipliers AND stored exceptions
    mults, n_exc = [], 0
    for r in range(1, st.next_round):
        if st.store.exists(r, "host_state"):
            mults += [s["mult"] for s in st.store.read(r, "host_state").collect()]
        if st.store.exists(r, "frontier_deferrals"):
            n_exc += st.store.read(r, "frontier_deferrals").count()
    assert any(m > 1 for m in mults), "no host ever backed off"
    assert n_exc > 0, "no stored exception was ever written"

    # reconstructed frontier snapshot == oracle's stored-bump snapshot
    last = st.next_round - 1
    got_f = {
        r["url_hash"]: (r["url"], r["not_before_round"])
        for r in rnd.read_frontier_view(st, last).collect()
    }
    exp_f = {
        e.url_hash: (e.url, e.not_before_round)
        for e in oracle.frontier_by_round[last]
    }
    assert got_f == exp_f


def test_delta_adaptive_resume_exact(spark):
    cfg = CrawlConfig(
        frontier_delta=True, adaptive_politeness=True, compact_frontier_every=3
    )
    spec = FetchSpec(not_found_mod=2)
    seeds = fixtures.seed_urls()

    def run(ckpt, rounds):
        shutil.rmtree(ckpt, ignore_errors=True)
        st = rnd.init_crawl(
            spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg,
            spec, ckpt=ckpt,
        )
        rnd.run_crawl(st, max_rounds=rounds)
        return st

    st_a = run("/tmp/crawlspark-test-fda-a", ROUNDS)
    run("/tmp/crawlspark-test-fda-b", 2)
    st_b = rnd.resume(spark, "/tmp/crawlspark-test-fda-b", cfg, spec)
    rnd.run_crawl(st_b, max_rounds=ROUNDS)
    oa = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_a).collect()]
    ob = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_b, ROUNDS).collect()]
    assert oa == ob


def test_resume_plain_checkpoint_with_delta_engine(spark):
    """Enabling frontier_delta on a checkpoint created by the plain engine
    must record the last full frontier as a base at resume time — otherwise
    the crash surfaces only AFTER the first delta round commits (the next
    read finds neither a base nor a full frontier)."""
    ckpt = "/tmp/crawlspark-test-fdelta-upgrade"
    st_plain, _ = _crawl(spark, CrawlConfig(frontier_delta=False), ckpt, rounds=2)
    last_plain = st_plain.next_round - 1

    st2 = rnd.resume(spark, ckpt, CFG, FetchSpec())
    assert last_plain in st2.store.frontier_bases()  # base recorded at resume
    rnd.run_crawl(st2, max_rounds=ROUNDS)

    # end-to-end result identical to an all-delta run from scratch
    st_all, _ = _crawl(spark, CFG, "/tmp/crawlspark-test-fdelta-upgrade-ref")
    oa = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_all).collect()]
    ob = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st2, ROUNDS).collect()]
    assert oa == ob


def test_resume_delta_requires_frontier_counter(spark):
    """A checkpoint whose last commit predates the frontier counter must be
    rejected, not silently resumed with n_frontier=0."""
    import json

    ckpt = "/tmp/crawlspark-test-fdelta-nocounter"
    _crawl(spark, CrawlConfig(frontier_delta=False), ckpt, rounds=2)
    mpath = os.path.join(ckpt, "_manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    for info in m.get("round_info", {}).values():
        info.pop("frontier", None)
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="frontier counter"):
        rnd.resume(spark, ckpt, CFG, FetchSpec())


def test_auto_engine_switches_both_directions_matches_oracle(spark):
    """frontier_delta='auto' (the shipped default) decides per round from
    the manifest's running frontier counter. Force a stored→delta switch
    and a delta→stored switch mid-crawl (threshold crossings via resume)
    and assert the mixed run is bit-equal to the oracle on crawl order,
    counters, seen set, and the reconstructed frontier snapshot — the
    two round kinds must interleave freely on one checkpoint."""
    ckpt = "/tmp/crawlspark-test-fauto"
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    cfg_stored = CrawlConfig(
        frontier_delta="auto", compact_frontier_every=3,
        frontier_delta_min_rows=10**9,
    )
    cfg_delta = cfg_stored.with_(frontier_delta_min_rows=0)

    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS),
        cfg_stored, FetchSpec(), ckpt=ckpt,
    )
    infos = rnd.run_crawl(st, max_rounds=2)            # rounds 1-2: stored
    st = rnd.resume(spark, ckpt, cfg_delta, FetchSpec())
    infos += rnd.run_crawl(st, max_rounds=4)           # rounds 3-4: delta
    st = rnd.resume(spark, ckpt, cfg_stored, FetchSpec())
    infos += rnd.run_crawl(st, max_rounds=ROUNDS)      # round 5: stored

    oracle = simulate(seeds, cfg_stored, FetchSpec(), max_rounds=ROUNDS)
    got = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()]
    assert got == oracle.crawl_order
    assert [(i["round"], i["selected"], i["new"], i["frontier"]) for i in infos] == [
        (o["round"], o["selected"], o["new"], o["frontier"]) for o in oracle.rounds
    ]
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert seen == oracle.seen
    last = st.next_round - 1
    got_f = {
        r["url_hash"]: (r["url"], r["not_before_round"])
        for r in rnd.read_frontier_view(st, last).collect()
    }
    exp_f = {
        e.url_hash: (e.url, e.not_before_round)
        for e in oracle.frontier_by_round[last]
    }
    assert got_f == exp_f

    # physical shape proves the switches actually happened: stored rounds
    # wrote full frontiers recorded as bases, delta rounds wrote delta dirs
    bases = set(st.store.frontier_bases())
    assert {0, 1, 2, 5} <= bases
    for r in (1, 2, 5):
        assert not st.store.exists(r, "frontier_delta_rows")
    assert st.store.exists(4, "frontier_delta_rows")
    assert not os.path.exists(
        os.path.join(ckpt, "round=4", "frontier", "_SUCCESS")
    )


def test_auto_engine_adaptive_switches_matches_oracle(spark):
    """auto × adaptive politeness: the stored round folds the sparse
    deferral exceptions into its base (stored-convention nb) and later
    delta rounds re-derive from it — same oracle, switches mid-crawl."""
    spec = FetchSpec(not_found_mod=2)
    ckpt = "/tmp/crawlspark-test-fauto-adaptive"
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    cfg_stored = CrawlConfig(
        frontier_delta="auto", adaptive_politeness=True,
        compact_frontier_every=3, frontier_delta_min_rows=10**9,
    )
    cfg_delta = cfg_stored.with_(frontier_delta_min_rows=0)

    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS),
        cfg_delta, spec, ckpt=ckpt,
    )
    rnd.run_crawl(st, max_rounds=3)                    # rounds 1-3: delta
    st = rnd.resume(spark, ckpt, cfg_stored, spec)
    rnd.run_crawl(st, max_rounds=4)                    # round 4: stored
    st = rnd.resume(spark, ckpt, cfg_delta, spec)
    rnd.run_crawl(st, max_rounds=ROUNDS)               # round 5: delta

    oracle = simulate(seeds, cfg_stored, spec, max_rounds=ROUNDS)
    got = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st).collect()]
    assert got == oracle.crawl_order
    seen = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert seen == oracle.seen
    last = st.next_round - 1
    got_f = {
        r["url_hash"]: (r["url"], r["not_before_round"])
        for r in rnd.read_frontier_view(st, last).collect()
    }
    exp_f = {
        e.url_hash: (e.url, e.not_before_round)
        for e in oracle.frontier_by_round[last]
    }
    assert got_f == exp_f
    assert 4 in st.store.frontier_bases()  # the stored round recorded a base


def test_auto_engine_self_heals_counterless_checkpoint(spark):
    """'auto' on a checkpoint without a frontier counter must NOT raise
    (only frontier_delta=True does): the first auto round resolves to
    stored, whose observed write re-seeds the counter."""
    import json

    ckpt = "/tmp/crawlspark-test-fauto-nocounter"
    _crawl(spark, CrawlConfig(frontier_delta=False), ckpt, rounds=2)
    mpath = os.path.join(ckpt, "_manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    for info in m.get("round_info", {}).values():
        info.pop("frontier", None)
    with open(mpath, "w") as f:
        json.dump(m, f)
    cfg_auto = CrawlConfig(frontier_delta="auto", compact_frontier_every=3)
    st = rnd.resume(spark, ckpt, cfg_auto, FetchSpec())
    rnd.run_crawl(st, max_rounds=ROUNDS)
    m2 = st.store.read_manifest()
    assert "frontier" in m2["round_info"][str(ROUNDS)]

    st_ref, _ = _crawl(spark, CFG, "/tmp/crawlspark-test-fauto-nocounter-ref")
    oa = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st_ref).collect()]
    ob = [(r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st, ROUNDS).collect()]
    assert oa == ob
