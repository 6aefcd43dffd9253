"""Opt-in host-priority boosts (CrawlConfig.host_boosts — the consumption
side of linkgraph.host_pagerank): engine ⇔ pure-Python-oracle crawl-order
equality with boosts ON, capacity-contention semantics (boosted hosts win
the round cap), a no-op guarantee with the feature OFF, and the
pagerank_boosts quantization bridge."""

import shutil

import pytest

from crawlspark import fixtures, linkgraph
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 3
# boost the two hot hosts apart and demote one cold host: exercises
# negative boosts, a positive boost, and the unlisted-host default (0)
BOOSTS = (("h1.example", -2), ("h0.example", -1), ("h3.example", 5))


def _engine_order(spark, cfg, ckpt):
    seeds = fixtures.seed_urls()
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark,
        spark.createDataFrame([(u,) for u in seeds], SEEDS),
        cfg,
        FetchSpec(),
        ckpt=ckpt,
    )
    rnd.run_crawl(st, max_rounds=ROUNDS)
    return [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]


@pytest.fixture(scope="module")
def boosted_cfg():
    return CrawlConfig(host_boosts=BOOSTS, round_capacity=10)


def test_boosted_crawl_order_matches_oracle(spark, boosted_cfg):
    got = _engine_order(spark, boosted_cfg, "/tmp/crawlspark-test-boost")
    oracle = simulate(
        fixtures.seed_urls(), boosted_cfg, FetchSpec(), max_rounds=ROUNDS
    )
    assert got == oracle.crawl_order
    # non-vacuous: with a tight capacity, every round leads with the
    # most-boosted host that has eligible URLs, and the boost actually
    # reordered emission vs the boost-free run
    base = simulate(
        fixtures.seed_urls(),
        boosted_cfg.with_(host_boosts=None),
        FetchSpec(),
        max_rounds=ROUNDS,
    )
    assert got != base.crawl_order
    first_urls = {r: u for r, s, u in got if s == 0}
    assert all("//h1.example" in u for u in first_urls.values())


def test_boost_changes_capacity_winners_not_per_host_order(spark, boosted_cfg):
    """Under a tight cap the boosted hosts take the slots; within any one
    host the relative order is identical to the unboosted crawl (a
    host-constant addend cannot reorder a host's own URLs)."""
    boosted = simulate(
        fixtures.seed_urls(), boosted_cfg, FetchSpec(), max_rounds=ROUNDS
    )
    base = simulate(
        fixtures.seed_urls(),
        boosted_cfg.with_(host_boosts=None),
        FetchSpec(),
        max_rounds=ROUNDS,
    )

    def per_host_sequences(order):
        seqs = {}
        for r, _s, u in order:
            host = u.split("/")[2]
            seqs.setdefault((r, host), []).append(u)
        return seqs

    b, n = per_host_sequences(boosted.crawl_order), per_host_sequences(base.crawl_order)
    # per (round, host): if BOTH crawls scheduled the host that round with
    # the same URL set, the within-host order must match exactly
    shared = 0
    for k in set(b) & set(n):
        if set(b[k]) == set(n[k]):
            assert b[k] == n[k], k
            shared += 1
    assert shared > 0


def test_flag_off_is_bit_identical(spark):
    a = _engine_order(spark, CrawlConfig(), "/tmp/crawlspark-test-boost-off")
    oracle = simulate(fixtures.seed_urls(), CrawlConfig(), max_rounds=ROUNDS)
    assert a == oracle.crawl_order


def test_relational_boosts_digest_equal(spark):
    """Directive: the DataFrame boost source (linkgraph.pagerank_boosts_df
    → CrawlState.boosts_df → rank.attach_boosts broadcast join) must be
    crawl-order digest-equal to the driver-side tuple source for the same
    ranks — the tuple is the ≲10^6-host policy hand-off, the DataFrame is
    the 10^8+-host path, and they are the same policy."""
    from crawlspark.xxh64 import hash_str

    docs_spans = spark.read.parquet(
        fixtures.fixture_dir("sf0.01") + "/documents_spans.parquet"
    )
    urls = spark.read.parquet(fixtures.fixture_dir("sf0.01") + "/doc_urls.parquet")
    ranks = linkgraph.host_pagerank(
        linkgraph.host_edges(docs_spans.join(urls, "doc_id")), n_iter=3
    ).persist()
    tup = linkgraph.pagerank_boosts(ranks, n_tiers=4)
    bdf = linkgraph.pagerank_boosts_df(ranks, n_tiers=4)
    # tier-for-tier: relational path == ntile tuple path (ties included)
    got = {r["host_hash"]: r["boost"] for r in bdf.collect()}
    assert got == {hash_str(h): b for h, b in tup}

    cfg_tuple = CrawlConfig(host_boosts=tup, round_capacity=8)
    via_tuple = _engine_order(spark, cfg_tuple, "/tmp/crawlspark-test-boost-tup")

    # same crawl, boosts supplied relationally (host_boosts unset)
    seeds = fixtures.seed_urls()
    ckpt = "/tmp/crawlspark-test-boost-rel"
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark,
        spark.createDataFrame([(u,) for u in seeds], SEEDS),
        CrawlConfig(round_capacity=8),
        FetchSpec(),
        ckpt=ckpt,
    )
    st.boosts_df = bdf
    rnd.run_crawl(st, max_rounds=ROUNDS)
    via_df = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    ranks.unpersist()
    assert via_df == via_tuple


def test_pagerank_boosts_bridge(spark):
    """End-to-end story: PageRank over the fixture link graph → quantized
    boosts → a valid config that the engine accepts and schedules with."""
    docs_spans = spark.read.parquet(
        fixtures.fixture_dir("sf0.01") + "/documents_spans.parquet"
    )
    urls = spark.read.parquet(fixtures.fixture_dir("sf0.01") + "/doc_urls.parquet")
    ranks = linkgraph.host_pagerank(
        linkgraph.host_edges(docs_spans.join(urls, "doc_id")), n_iter=3
    )
    boosts = linkgraph.pagerank_boosts(ranks, n_tiers=4)
    assert boosts and all(-4 <= b <= 0 for _, b in boosts)
    # hot-skew fixture: h0/h1 absorb ~half the links → must sit in tier 1
    top = {h for h, b in boosts if b == -3}
    assert {"h0.example", "h1.example"} <= top
    cfg = CrawlConfig(host_boosts=boosts, round_capacity=8)
    cfg.validate()
    got = _engine_order(spark, cfg, "/tmp/crawlspark-test-boost-pr")
    oracle = simulate(fixtures.seed_urls(), cfg, FetchSpec(), max_rounds=ROUNDS)
    assert got == oracle.crawl_order


def test_trust_boosts_demote_link_farm_in_schedule(spark):
    """VERDICT r6 directive #5: the anti-spam composition
    (linkgraph.trust_boosts_df) must BIND to crawl order through the
    existing boosts_df seam. A planted link-farm host carries top
    PageRank but zero trust (spam_mass 1.0): under plain PageRank tiers
    it rides tier 1; under trust-adjusted boosts it clamps to +n_tiers
    and schedules behind every other host in every round. The same
    policy replayed as a config tuple through the pure-Python oracle is
    bit-equal (the attach_boosts two-source equivalence)."""
    from crawlspark.xxh64 import hash_str

    hosts = [f"h{i}.example" for i in range(7)]
    farm = "h1.example"
    pr = spark.createDataFrame(
        [(farm, 0.4)] + [(h, 0.1) for h in hosts if h != farm],
        "host string, pr double",
    )
    trust = spark.createDataFrame(
        [(farm, 0.0)] + [(h, 0.1) for h in hosts if h != farm],
        "host string, trust double",
    )
    pb = linkgraph.pagerank_boosts_df(pr, n_tiers=4)
    tb = linkgraph.trust_boosts_df(pr, trust, n_tiers=4, spam_threshold=0.5)
    pb_map = {r["host_hash"]: r["boost"] for r in pb.collect()}
    tb_map = {r["host_hash"]: r["boost"] for r in tb.collect()}
    fh = hash_str(farm)
    assert pb_map[fh] == -3  # manufactured rank = top tier
    assert tb_map[fh] == 4  # trust clamp = behind everything
    assert all(b == pb_map[h] for h, b in tb_map.items() if h != fh)

    def _order_with(bdf, ckpt):
        seeds = fixtures.seed_urls()
        shutil.rmtree(ckpt, ignore_errors=True)
        st = rnd.init_crawl(
            spark,
            spark.createDataFrame([(u,) for u in seeds], SEEDS),
            CrawlConfig(round_capacity=None),
            FetchSpec(),
            ckpt=ckpt,
        )
        st.boosts_df = bdf
        rnd.run_crawl(st, max_rounds=ROUNDS)
        return [
            (r["round"], r["seq"], r["url"])
            for r in rnd.read_crawl_order(st).collect()
        ]

    via_pr = _order_with(pb, "/tmp/crawlspark-test-trust-pr")
    via_tr = _order_with(tb, "/tmp/crawlspark-test-trust-tb")
    assert via_pr != via_tr

    def split(order):
        per_round = {}
        for r, s, u in order:
            per_round.setdefault(r, []).append((s, f"//{farm}" in u))
        return per_round

    tr_rounds = split(via_tr)
    # non-vacuous: the farm is actually crawled under trust boosts ...
    assert any(isf for rs in tr_rounds.values() for _, isf in rs)
    # ... but in EVERY round all its URLs sort after all non-farm URLs
    for r, rs in tr_rounds.items():
        farm_seqs = [s for s, isf in rs if isf]
        org_seqs = [s for s, isf in rs if not isf]
        if farm_seqs and org_seqs:
            assert min(farm_seqs) > max(org_seqs), r
    # under plain PageRank tiers it is NOT always last (tier 1 leads)
    pr_rounds = split(via_pr)
    assert any(
        fs and os_ and min(fs) < max(os_)
        for fs, os_ in (
            ([s for s, i in rs if i], [s for s, i in rs if not i])
            for rs in pr_rounds.values()
        )
    )
    # oracle mirror: identical policy as a tuple through the simulator
    tup = tuple((h, int(tb_map[hash_str(h)])) for h in hosts)
    oracle = simulate(
        fixtures.seed_urls(),
        CrawlConfig(round_capacity=None, host_boosts=tup),
        FetchSpec(),
        max_rounds=ROUNDS,
    )
    assert via_tr == oracle.crawl_order
