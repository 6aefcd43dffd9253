"""Engine ⇔ oracle equality — the reference-substitute correctness gate
(SURVEY.md §6.2.3, BASELINE.json north_rule: "matching the reference's
crawl ordering and URL-seen set under the same seed list + politeness
budget")."""

import shutil

import pytest

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import seen_digest, simulate

ROUNDS = 3
CKPT = "/tmp/crawlspark-test-eq"


@pytest.fixture(scope="module")
def crawl_pair(spark):
    cfg = CrawlConfig()
    spec = FetchSpec()
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg, spec, ckpt=CKPT
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, cfg, spec, max_rounds=ROUNDS)
    return st, infos, oracle, cfg


def test_crawl_order_equality(crawl_pair):
    st, _, oracle, _ = crawl_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order


def test_round_counters(crawl_pair):
    _, infos, oracle, _ = crawl_pair
    assert [
        (i["round"], i["selected"], i["new"], i["frontier"]) for i in infos
    ] == [(o["round"], o["selected"], o["new"], o["frontier"]) for o in oracle.rounds]


def test_final_seen_set_equality(crawl_pair):
    st, _, oracle, _ = crawl_pair
    rows = rnd.read_final_seen(st).collect()
    got = {r["url_hash"]: r["url"] for r in rows}
    assert len(rows) == len(got), "duplicate url_hash rows in seen table"
    assert got == oracle.seen
    n, x = seen_digest(oracle)
    gx = 0
    for uh in got:
        gx ^= uh & 0xFFFFFFFFFFFFFFFF
    assert (len(got), gx) == (n, x)


def test_frontier_snapshot_equality(crawl_pair):
    st, _, oracle, _ = crawl_pair
    for r in range(0, ROUNDS + 1):
        if r not in oracle.frontier_by_round:
            continue
        got = sorted(
            (
                (
                    row["url"],
                    row["url_hash"],
                    row["priority"],
                    row["crawl_depth"],
                    row["not_before_round"],
                )
                for row in rnd.read_frontier_view(st, r).collect()
            )
        )
        want = sorted(
            (e.url, e.url_hash, e.priority, e.crawl_depth, e.not_before_round)
            for e in oracle.frontier_by_round[r]
        )
        assert got == want, f"frontier mismatch at round {r}"


def test_documents_span_fidelity(crawl_pair):
    """Span-sequence equality (kind, text, media_ref, order) vs the spec —
    the BASELINE.json:15 per-row invariant, checked via posexplode with
    pos↔offset correspondence (SURVEY.md §3.8 X4)."""
    from pyspark.sql import functions as F

    from crawlspark.fetch_spec import simulate_fetch

    st, _, oracle, _ = crawl_pair
    docs = st.store.read_all("documents", ROUNDS)
    ex = (
        docs.filter(F.col("spans").isNotNull())
        .select("url", F.posexplode("spans").alias("pos", "s"))
        .select("url", "pos", "s.kind", "s.text", "s.media_ref", "s.offset")
    )
    rows = ex.collect()
    assert all(r["pos"] == r["offset"] for r in rows), "span order not preserved"
    by_url: dict[str, list] = {}
    for r in rows:
        by_url.setdefault(r["url"], []).append(
            (r["pos"], r["kind"], r["text"], r["media_ref"])
        )
    for url, got_spans in by_url.items():
        got_spans.sort()
        _, want = simulate_fetch(url, FetchSpec())
        want_spans = [(s["offset"], s["kind"], s["text"], s["media_ref"]) for s in want]
        assert got_spans == want_spans, url
