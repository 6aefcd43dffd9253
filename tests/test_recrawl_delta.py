"""Delta engine for the recrawl_state table (CrawlConfig.recrawl_delta —
VERDICT r6 directive #4: the state was whole-rewritten every round,
O(all URLs ever fetched) write amplification once recrawl is on).

Equivalence discipline of test_frontier_delta: the delta engine must be
bit-equal to the stored engine on crawl order, counters, and the RESOLVED
state table at every round; physically it may only write the rows a round
touches; run+resume and vacuum-then-resume stay exact; 'auto' switches
engines by the manifest row counter and self-heals without one."""

import shutil

import pytest
from pyspark.sql import functions as F

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS

ROUNDS = 7
SPEC = FetchSpec(change_mod=3)


def _run(spark, cfg, ckpt, rounds=ROUNDS):
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark,
        spark.createDataFrame([(u,) for u in seeds], SEEDS),
        cfg,
        SPEC,
        ckpt=ckpt,
    )
    rnd.run_crawl(st, max_rounds=rounds)
    return st


def _order(st):
    return [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]


_STATE_COLS = [
    "url_hash", "url", "host", "host_hash", "priority", "crawl_depth",
    "last_fetch_round", "fingerprint", "n_changed", "n_unchanged",
    "enqueued_round",
]


def _state_rows(st, r):
    # fixed column order: joins inside recrawl_due reorder the stored
    # engine's physical column order on due rounds (values unaffected)
    df = st.store.read_recrawl(r)
    return (
        sorted(map(tuple, df.select(*_STATE_COLS).collect()))
        if df is not None
        else None
    )


def _info(st):
    m = st.store.read_manifest()
    # recrawl_rows is engine metadata, not crawl semantics — compare the rest
    return {
        k: {kk: vv for kk, vv in v.items() if kk != "recrawl_rows"}
        for k, v in m.get("round_info", {}).items()
    }


CFG_STORED = CrawlConfig(
    recrawl_every=2, recrawl_interval=2, conditional_fetch=True,
    recrawl_delta=False,
)
CFG_DELTA = CFG_STORED.with_(recrawl_delta=True, compact_recrawl_every=3)


@pytest.fixture(scope="module")
def engine_pair(spark):
    st_s = _run(spark, CFG_STORED, "/tmp/crawlspark-test-rdelta-stored")
    st_d = _run(spark, CFG_DELTA, "/tmp/crawlspark-test-rdelta-delta")
    return st_s, st_d


def test_delta_engine_matches_stored(spark, engine_pair):
    st_s, st_d = engine_pair
    assert _order(st_d) == _order(st_s)
    assert _info(st_d) == _info(st_s)
    for r in range(1, ROUNDS + 1):
        a = _state_rows(st_s, r)
        b = _state_rows(st_d, r)
        assert a == b, f"state diverged at round {r}"
    assert _state_rows(st_s, ROUNDS)  # non-vacuous: state has rows


def test_delta_engine_is_physically_delta(spark, engine_pair):
    """Delta rounds write recrawl_state_delta ONLY (full dirs exist just at
    round 1 — prev None forces the base — and compaction rounds), and each
    delta holds strictly fewer rows than the resolved state it updates."""
    st_s, st_d = engine_pair
    store = st_d.store
    bases = store.recrawl_bases()
    assert bases and bases[0] == 1  # first write is the forced base
    # compaction cadence (every 3): rounds 3 and 6 fold the chain
    assert 3 in bases and 6 in bases
    for r in range(2, ROUNDS + 1):
        assert store.exists(r, "recrawl_state_delta"), r
        assert store.exists(r, "recrawl_state") == (r in bases), r
    n_full = st_d.store.read_recrawl(ROUNDS).count()
    n_delta = store.read(ROUNDS, "recrawl_state_delta").count()
    assert 0 < n_delta < n_full
    # stored engine: every round is a full dir + recorded base
    assert st_s.store.recrawl_bases() == list(range(1, ROUNDS + 1))


def test_delta_resume_exact(spark):
    ckpt = "/tmp/crawlspark-test-rdelta-resume"
    st = _run(spark, CFG_DELTA, ckpt, rounds=ROUNDS)
    full_order = _order(st)
    full_state = _state_rows(st, ROUNDS)
    full_info = _info(st)
    # crash after round 4, resume through ROUNDS
    st.store.drop_rounds_after(4)
    st2 = rnd.resume(spark, ckpt, CFG_DELTA, SPEC)
    rnd.run_crawl(st2, max_rounds=ROUNDS)
    assert _order(st2) == full_order
    assert _state_rows(st2, ROUNDS) == full_state
    assert _info(st2) == full_info


def test_delta_vacuum_then_resume_exact(spark):
    ckpt = "/tmp/crawlspark-test-rdelta-vacuum"
    st = _run(spark, CFG_DELTA, ckpt, rounds=ROUNDS)
    full_order = _order(st)
    full_state = _state_rows(st, ROUNDS)
    removed = st.store.vacuum()["removed"]
    # superseded recrawl dirs (below the last base, round 6) are gone
    assert any("recrawl_state" in x for x in removed)
    for r in range(1, 6):
        assert not st.store.exists(r, "recrawl_state"), r
        assert not st.store.exists(r, "recrawl_state_delta"), r
    # state still resolves identically and the crawl continues exactly
    assert _state_rows(st, ROUNDS) == full_state
    st2 = rnd.resume(spark, ckpt, CFG_DELTA, SPEC)
    rnd.run_crawl(st2, max_rounds=ROUNDS + 2)
    o = _order(st2)
    assert [t for t in o if t[0] <= ROUNDS] == full_order


def test_auto_engine_switches_and_matches(spark):
    """auto with a tiny threshold: round 1 is stored (no counter yet —
    self-heal default), the counter the stored write seeds flips every
    later round to delta; the whole run stays bit-equal to pure stored."""
    cfg_auto = CFG_STORED.with_(
        recrawl_delta="auto", recrawl_delta_min_rows=1, compact_recrawl_every=4
    )
    st_a = _run(spark, cfg_auto, "/tmp/crawlspark-test-rdelta-auto")
    st_s = _run(spark, CFG_STORED, "/tmp/crawlspark-test-rdelta-stored2")
    assert _order(st_a) == _order(st_s)
    assert _state_rows(st_a, ROUNDS) == _state_rows(st_s, ROUNDS)
    store = st_a.store
    # delta engaged: later rounds write deltas, not full states
    assert store.exists(ROUNDS, "recrawl_state_delta")
    assert not store.exists(ROUNDS, "recrawl_state")
    # the tracked-row counter is maintained through BOTH engines
    info = store.read_manifest()["round_info"]
    stored_info = st_s.store.read_manifest()["round_info"]
    for r in range(1, ROUNDS + 1):
        assert info[str(r)]["recrawl_rows"] == stored_info[str(r)][
            "recrawl_rows"
        ], r
        assert info[str(r)]["recrawl_rows"] == st_a.store.read_recrawl(
            r
        ).count(), r


def test_recrawl_rows_counter_matches_oracle(spark):
    """The tracked-row counter both engines maintain equals the oracle's
    state-table population every round (the auto engine's decision input
    is itself oracle-mirrored, not just plumbing)."""
    from oracle.simulator import simulate

    st = _run(spark, CFG_DELTA, "/tmp/crawlspark-test-rdelta-counter")
    oracle = simulate(
        fixtures.seed_urls(), CFG_DELTA, SPEC, max_rounds=ROUNDS
    )
    info = st.store.read_manifest()["round_info"]
    for o in oracle.rounds:
        assert info[str(o["round"])]["recrawl_rows"] == o["recrawl_rows"], o[
            "round"
        ]
