"""Link-graph operator properties (crawlspark.linkgraph): edge
conservation and relative-ref resolution, PageRank vs a NumPy power-
iteration reference, deterministic anchor tie-breaks, laziness of
construction, and parallelism invariance of the rounded ranks.
(Cross-engine value equality for the three driver queries is covered by
tests/test_driver_contract.py, which auto-picks every queries() entry.)"""

import pyspark.sql.functions as F
import pytest

from crawlspark import linkgraph

SPAN_SCHEMA = (
    "doc_id string, url string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def _span(kind, text, ref, off):
    return {"kind": kind, "text": text, "media_ref": ref, "offset": off}


@pytest.fixture()
def small_docs(spark):
    return _docs(
        spark,
        [
            # absolute, path-absolute, dotted-relative, non-link (ignored)
            (
                "d0",
                "http://a.example/x",
                [
                    _span("link", "go b", "http://b.example/p/1", 0),
                    _span("link", "self", "/p/2", 1),
                    _span("link", "self", "../p/3", 2),
                    _span("image", "", "http://c.example/i.jpg", 3),
                    _span("text", "hello", None, 4),
                ],
            ),
            (
                "d1",
                "http://b.example/y",
                [
                    _span("link", "go a", "http://a.example/p/9", 0),
                    _span("link", "go a", "http://a.example/p/10", 1),
                ],
            ),
        ],
    )


def test_host_edges_resolution_and_conservation(small_docs):
    edges = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in linkgraph.host_edges(small_docs).collect()
    }
    # image/text spans excluded; relative refs land on the SOURCE host
    assert edges == {
        ("a.example", "b.example"): 1,
        ("a.example", "a.example"): 2,
        ("b.example", "a.example"): 2,
    }
    n_link_spans = small_docs.select(
        F.explode(F.filter("spans", lambda s: s["kind"] == "link"))
    ).count()
    assert sum(edges.values()) == n_link_spans


def test_pagerank_matches_numpy_reference(spark, small_docs):
    edges = linkgraph.host_edges(small_docs)
    got = {r["host"]: r["pr"] for r in linkgraph.host_pagerank(edges, n_iter=4).collect()}

    # independent dense power iteration (same fixed count, same damping)
    import numpy as np

    hosts = sorted(got)
    idx = {h: i for i, h in enumerate(hosts)}
    w = np.zeros((len(hosts), len(hosts)))
    for r in edges.collect():
        w[idx[r["src_host"]], idx[r["dst_host"]]] += r["n_links"]
    share = w / w.sum(axis=1, keepdims=True)
    n = len(hosts)
    pr = np.full(n, 1.0 / n)
    for _ in range(4):
        pr = (1.0 - 0.85) / n + 0.85 * (share.T @ pr)
    for h in hosts:
        assert got[h] == pytest.approx(pr[idx[h]], abs=2e-6)
    # no dangling hosts in this graph → total mass conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-5)


def test_pagerank_lazy_and_parallelism_invariant(spark, small_docs):
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    df = linkgraph.host_pagerank(linkgraph.host_edges(small_docs), n_iter=3)
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before, "host_pagerank construction must not run a job"

    a = sorted(map(tuple, df.collect()))
    b = sorted(
        map(
            tuple,
            linkgraph.host_pagerank(
                linkgraph.host_edges(small_docs.repartition(7)), n_iter=3
            ).collect(),
        )
    )
    assert a == b


def test_anchor_stats_tie_break(spark):
    docs = _docs(
        spark,
        [
            (
                "d0",
                "http://a.example/",
                [
                    _span("link", "zeta", "http://t.example/1", 0),
                    _span("link", "alpha", "http://t.example/2", 1),
                ],
            ),
            (
                "d1",
                "http://b.example/",
                [
                    _span("link", "zeta", "http://t.example/3", 0),
                    _span("link", "alpha", "http://t.example/4", 1),
                ],
            ),
        ],
    )
    rows = linkgraph.anchor_stats(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    # 2-2 tie between 'alpha' and 'zeta' → lexicographically smallest wins
    assert (r["dst_host"], r["top_anchor"], r["top_anchor_n"]) == (
        "t.example",
        "alpha",
        2,
    )
    assert (r["n_inlinks"], r["n_src_hosts"], r["n_anchors"]) == (4, 2, 2)


def test_hits_matches_numpy_reference(spark, small_docs):
    edges = linkgraph.host_edges(small_docs)
    got = {
        r["host"]: (r["hub"], r["auth"])
        for r in linkgraph.host_hits(edges, n_iter=4).collect()
    }

    # independent dense HITS: same fixed half-steps, un-normalized
    # iterations, one L-inf normalization at the end (operator docstring)
    import numpy as np

    hosts = sorted(got)
    idx = {h: i for i, h in enumerate(hosts)}
    w = np.zeros((len(hosts), len(hosts)))
    for r in edges.collect():
        w[idx[r["src_host"]], idx[r["dst_host"]]] += r["n_links"]
    # trace order: a1 from h0, h1 from a1, ... a4 from h3, h4 from a4
    hub0 = np.ones(len(hosts))
    auth = w.T @ hub0
    for k in range(4):
        hubv = w @ auth
        if k < 3:
            auth = w.T @ hubv
    hubv = hubv / hubv.max()
    auth = auth / auth.max()
    for h in hosts:
        assert got[h][0] == pytest.approx(hubv[idx[h]], abs=2e-6)
        assert got[h][1] == pytest.approx(auth[idx[h]], abs=2e-6)
    # L-inf normalization: both vectors peak at exactly 1
    assert max(v[0] for v in got.values()) == pytest.approx(1.0)
    assert max(v[1] for v in got.values()) == pytest.approx(1.0)


def test_hits_lazy_and_parallelism_invariant(spark, small_docs):
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    df = linkgraph.host_hits(linkgraph.host_edges(small_docs), n_iter=3)
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before, "host_hits construction must not run a job"

    a = sorted(map(tuple, df.collect()))
    b = sorted(
        map(
            tuple,
            linkgraph.host_hits(
                linkgraph.host_edges(small_docs.repartition(7)), n_iter=3
            ).collect(),
        )
    )
    assert a == b


def test_trustrank_planted_spam_clique(spark):
    """TrustRank semantics on a planted graph: trust flows only OUT of
    seeds, so a link clique unreachable from any seed — the link-farm
    shape that inflates plain PageRank — gets exactly 0 trust, while
    every seed-reachable host gets > 0. Also: numpy power-iteration
    reference, laziness, and parallelism invariance."""
    docs = _docs(
        spark,
        [
            # trusted side: seed -> b -> c (chain)
            ("d0", "http://seed.example/", [_span("link", "b", "http://b.example/", 0)]),
            ("d1", "http://b.example/", [_span("link", "c", "http://c.example/", 0)]),
            # spam clique x <-> y, also linking INTO the trusted side
            # (inlinks must not manufacture trust)
            (
                "d2",
                "http://x.example/",
                [
                    _span("link", "y", "http://y.example/", 0),
                    _span("link", "b", "http://b.example/", 1),
                ],
            ),
            ("d3", "http://y.example/", [_span("link", "x", "http://x.example/", 0)]),
        ],
    )
    edges = linkgraph.host_edges(docs)
    seeds = spark.createDataFrame([("seed.example",)], "host string")

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    df = linkgraph.host_trustrank(edges, seeds, n_iter=4)
    assert len(tracker.getJobIdsForGroup(None)) == before, (
        "host_trustrank construction must not run a job"
    )

    got = {r["host"]: r["trust"] for r in df.collect()}
    assert got["x.example"] == 0.0 and got["y.example"] == 0.0
    assert got["seed.example"] > 0 and got["b.example"] > 0
    assert got["c.example"] > 0
    # plain PageRank scores the clique ABOVE zero — the gap TrustRank closes
    pr = {r["host"]: r["pr"] for r in linkgraph.host_pagerank(edges, n_iter=4).collect()}
    assert pr["x.example"] > 0 and pr["y.example"] > 0

    # numpy reference: t_{k+1} = (1-d) s + d Share^T t
    import numpy as np

    hosts = sorted(got)
    idx = {h: i for i, h in enumerate(hosts)}
    w = np.zeros((len(hosts), len(hosts)))
    for r in edges.collect():
        w[idx[r["src_host"]], idx[r["dst_host"]]] += r["n_links"]
    out = w.sum(axis=1, keepdims=True)
    share = np.divide(w, out, out=np.zeros_like(w), where=out > 0)
    s = np.zeros(len(hosts))
    s[idx["seed.example"]] = 1.0
    t = s.copy()
    for _ in range(4):
        t = (1.0 - 0.85) * s + 0.85 * (share.T @ t)
    for h in hosts:
        assert got[h] == pytest.approx(t[idx[h]], abs=2e-6)

    # parallelism invariance of the rounded output
    b = {
        r["host"]: r["trust"]
        for r in linkgraph.host_trustrank(
            linkgraph.host_edges(docs.repartition(7)), seeds, n_iter=4
        ).collect()
    }
    assert got == b

    # spam mass: the zero-trust clique has ALL of its PageRank
    # unaccounted for (m = 1.0); the seed keeps most of its own
    pr_df = linkgraph.host_pagerank(edges, n_iter=4)
    tr_df = linkgraph.host_trustrank(edges, seeds, n_iter=4)
    sm = {
        r["host"]: r["spam_mass"]
        for r in linkgraph.spam_mass(pr_df, tr_df).collect()
    }
    assert sm["x.example"] == 1.0 and sm["y.example"] == 1.0
    assert sm["seed.example"] < 0.5
    assert all(m <= 1.0 for m in sm.values())


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src_host string, dst_host string, n_links long")


def test_opic_hand_computed_tiny_graph(spark):
    """OPIC on a→b, a→c, b→a with c dangling, 2 synchronous steps —
    every value hand-derived (fractions in the comments):

    s0: cash 1/3 each. step1: a→{b,c} 1/6 each, b→a 1/3, c's 1/3
    recycles 1/9 each → cash (4/9, 5/18, 5/18), history 1/3 each.
    step2: a→{b,c} 2/9 each, b→a 5/18, c's 5/18 recycles 5/54 each →
    cash (10/27, 17/54, 17/54), history (7/9, 11/18, 11/18);
    opic = (history + cash) / 3."""
    edges = _edges(
        spark, [("a", "b", 1), ("a", "c", 1), ("b", "a", 1)]
    )
    out = {r.host: r for r in linkgraph.host_opic(edges, n_iter=2).collect()}
    assert out["a"].cash == round(10 / 27, 6)
    assert out["b"].cash == out["c"].cash == round(17 / 54, 6)
    assert out["a"].history == round(7 / 9, 6)
    assert out["b"].history == out["c"].history == round(11 / 18, 6)
    assert out["a"].opic == round((7 / 9 + 10 / 27) / 3, 6)
    assert out["b"].opic == round((11 / 18 + 17 / 54) / 3, 6)


def test_opic_conservation_and_authority_order(spark, small_docs):
    """Invariants of the virtual-node recycling: Σcash = 1 and
    Σhistory = n_iter at every depth (cash is conserved, one unit banks
    per step); a host every other host links to out-ranks a host nobody
    links to."""
    edges = linkgraph.host_edges(small_docs)
    for k in (1, 3, 5):
        rows = linkgraph.host_opic(edges, n_iter=k).collect()
        assert abs(sum(r.cash for r in rows) - 1.0) < 1e-9
        assert abs(sum(r.history for r in rows) - float(k)) < 1e-9
    hub = _edges(
        spark,
        [("s1", "hub", 3), ("s2", "hub", 2), ("s3", "hub", 1), ("hub", "s1", 1)],
    )
    out = {r.host: r.opic for r in linkgraph.host_opic(hub, n_iter=4).collect()}
    assert out["hub"] > out["s2"] and out["hub"] > out["s3"]


def test_opic_feeds_the_boosts_seam(spark, small_docs):
    """The scheduler hand-off named in host_opic's docstring: OPIC scores
    aliased to pr flow through pagerank_boosts_df unchanged — the boosts
    seam is score-agnostic, so the online estimator can drive crawl
    order exactly like batch PageRank tiers."""
    edges = linkgraph.host_edges(small_docs)
    scores = linkgraph.host_opic(edges, n_iter=4).select(
        "host", F.col("opic").alias("pr")
    )
    boosts = linkgraph.pagerank_boosts_df(scores, n_tiers=4, key="host").collect()
    assert len(boosts) == scores.count()
    tiers = sorted({r.boost for r in boosts})
    assert tiers[0] >= -3 and tiers[-1] <= 0  # tier boosts in [-n_tiers+1, 0]
    # tuple path agrees (the digest-equality contract of the two forms)
    tup = dict(linkgraph.pagerank_boosts(scores, n_tiers=4))
    assert {r.host: r.boost for r in boosts} == tup
