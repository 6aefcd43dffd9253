"""Opt-in conditional refetch (CrawlConfig.conditional_fetch over the
recrawl loop): a refetch whose content fingerprint matches the stored
recrawl_state validator is recorded as 304 Not Modified with an EMPTY
span payload — nothing re-stored, nothing re-parsed. Full engine ⇔ oracle
equality (crawl order, counters incl. not_modified, per-round documents,
recrawl_state), non-vacuity (304s actually happen; changed refetches
still 200), the economy theorem (vs the same crawl with revalidation
off: crawl order / seen set / recrawl_state bit-identical, stored span
payload strictly smaller), and run+resume exactness."""

import shutil

import pytest

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 7
CKPT = "/tmp/crawlspark-test-condfetch"
SPEC = FetchSpec(change_mod=3)
CFG = CrawlConfig(recrawl_every=2, recrawl_interval=2, conditional_fetch=True)


def test_flag_requires_recrawl():
    with pytest.raises(ValueError):
        CrawlConfig(conditional_fetch=True).validate()


@pytest.fixture(scope="module")
def cf_pair(spark):
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), CFG, SPEC,
        ckpt=CKPT,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, CFG, SPEC, max_rounds=ROUNDS)
    return st, infos, oracle


def _engine_docs(st, rounds):
    out = []
    for r in range(1, rounds + 1):
        for row in st.store.read(r, "documents").collect():
            spans = [
                (s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in (row["spans"] or [])
            ]
            out.append((row["doc_id"], row["url"], r, row["status"], spans))
    return sorted(out)


def _oracle_docs(oracle):
    out = []
    for doc_id, url, r, status, spans in oracle.docs:
        out.append(
            (
                doc_id, url, r, status,
                [
                    (s["kind"], s["text"], s["media_ref"], s["offset"])
                    for s in (spans or [])
                ],
            )
        )
    return sorted(out)


def test_order_counters_and_docs_match_oracle(cf_pair):
    st, infos, oracle = cf_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order
    assert [
        (i["round"], i["recrawled"], i["not_modified"]) for i in infos
    ] == [
        (o["round"], o["recrawled"], o["not_modified"]) for o in oracle.rounds
    ]
    # non-vacuity: revalidation fired AND some refetches genuinely changed
    assert sum(i["not_modified"] for i in infos) > 0
    assert sum(s["n_changed"] for s in oracle.recrawl_state.values()) > 0
    # the documents sink matches row-for-row; every 304 row is payload-free
    edocs = _engine_docs(st, ROUNDS)
    assert edocs == _oracle_docs(oracle)
    n304 = sum(1 for d in edocs if d[3] == 304)
    assert n304 == sum(i["not_modified"] for i in infos) > 0
    assert all(d[4] == [] for d in edocs if d[3] == 304)


def test_state_matches_oracle(cf_pair):
    st, _, oracle = cf_pair
    last = st.next_round - 1
    rows = st.store.read(last, "recrawl_state").collect()
    got = {
        r["url_hash"]: (
            r["url"], r["last_fetch_round"], r["fingerprint"],
            r["n_changed"], r["n_unchanged"], r["enqueued_round"],
        )
        for r in rows
    }
    exp = {
        uh: (
            s["url"], s["last"], s["fp"], s["n_changed"], s["n_unchanged"],
            s["enq"],
        )
        for uh, s in oracle.recrawl_state.items()
    }
    assert got == exp
    # 304s accrued as unchanged pairs
    assert sum(s["n_unchanged"] for s in oracle.recrawl_state.values()) > 0


def test_economy_result_neutral_but_cheaper(spark, cf_pair):
    """The revalidation theorem: with the flag OFF the same crawl produces
    the IDENTICAL crawl order, seen set, and recrawl_state (a 304 is a
    200-unchanged for every downstream decision) — but stores strictly
    more span payload."""
    st_on, _, _ = cf_pair
    ck = CKPT + "-off"
    shutil.rmtree(ck, ignore_errors=True)
    seeds = fixtures.seed_urls()
    cfg_off = CrawlConfig(recrawl_every=2, recrawl_interval=2)
    st_off = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS),
        cfg_off, SPEC, ckpt=ck,
    )
    rnd.run_crawl(st_off, max_rounds=ROUNDS)

    order_on = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st_on).collect()
    ]
    order_off = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st_off).collect()
    ]
    assert order_on == order_off
    seen_on = sorted(
        (r["url_hash"], r["url"]) for r in rnd.read_final_seen(st_on).collect()
    )
    seen_off = sorted(
        (r["url_hash"], r["url"]) for r in rnd.read_final_seen(st_off).collect()
    )
    assert seen_on == seen_off
    state = lambda st: sorted(  # noqa: E731
        tuple(r)
        for r in st.store.read(st.next_round - 1, "recrawl_state").collect()
    )
    assert state(st_on) == state(st_off)

    def payload_chars(st):
        tot = 0
        for d in _engine_docs(st, ROUNDS):
            tot += sum(len(s[1] or "") for s in d[4])
        return tot

    assert payload_chars(st_on) < payload_chars(st_off)


def test_resume_bit_identical(spark):
    seeds = fixtures.seed_urls()
    seeds_df = spark.createDataFrame([(u,) for u in seeds], SEEDS)
    a, b = CKPT + "-a", CKPT + "-b"

    shutil.rmtree(a, ignore_errors=True)
    st_a = rnd.init_crawl(spark, seeds_df, CFG, SPEC, ckpt=a)
    rnd.run_crawl(st_a, max_rounds=6)

    shutil.rmtree(b, ignore_errors=True)
    st_b = rnd.init_crawl(spark, seeds_df, CFG, SPEC, ckpt=b)
    rnd.run_crawl(st_b, max_rounds=3)
    del st_b
    st_b2 = rnd.resume(spark, b, CFG, SPEC)
    assert st_b2.next_round == 4
    rnd.run_crawl(st_b2, max_rounds=6)

    def outputs(st):
        order = [
            (r["round"], r["seq"], r["url"])
            for r in rnd.read_crawl_order(st, 6).collect()
        ]
        state = sorted(
            tuple(r) for r in st.store.read(6, "recrawl_state").collect()
        )
        return order, state, _engine_docs(st, 6)

    assert outputs(st_a) == outputs(st_b2)
