"""Opt-in HTTP redirects (FetchSpec.redirect_mod): 301 responses carry one
`location` span; the target enters the candidate pipeline with UNCHANGED
priority/depth (a redirect is the same resource, not an outlink), checked
by full engine ⇔ oracle equality over a redirect-bearing fetch universe.
parse.redirect_edges + graphops.redirect_resolve then turn the accumulated
301 docs into a chain-resolved alias map, cross-checked against a
pure-Python walk of fetch_spec.redirect_of."""

import shutil

import pytest
from pyspark.sql import functions as F

from crawlspark import fetch_spec as fs
from crawlspark import fixtures, graphops, parse
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS
from oracle.simulator import simulate

ROUNDS = 3
CKPT = "/tmp/crawlspark-test-redir"
SPEC = FetchSpec(redirect_mod=6)


def test_simulator_redirects_deterministic():
    spec = SPEC
    urls = [f"http://h{k}.example/p/{p}" for k in range(10) for p in range(40)]
    n_redir = 0
    for u in urls:
        tgt = fs.redirect_of(u, spec)
        s1, sp1 = fs.simulate_fetch(u, spec)
        s2, sp2 = fs.simulate_fetch(u, spec)
        assert (s1, sp1) == (s2, sp2)
        if tgt is None:
            assert s1 in (200, 404)
            continue
        n_redir += 1
        assert s1 == 301
        assert sp1 == [
            {"kind": "location", "text": "", "media_ref": tgt, "offset": 0}
        ]
    assert n_redir > 20, "redirect universe must be dense enough to bind"


def test_redirect_mod_zero_is_byte_identical():
    """Off by default: the flag must not perturb the existing universe."""
    for k in range(50):
        u = f"http://h{k % 7}.example/p/{k}"
        assert fs.simulate_fetch(u, FetchSpec()) == fs.simulate_fetch(
            u, FetchSpec(redirect_mod=0)
        )
        assert fs.redirect_of(u, FetchSpec()) is None


@pytest.fixture(scope="module")
def redir_pair(spark):
    cfg = CrawlConfig()
    seeds = fixtures.seed_urls()
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark, spark.createDataFrame([(u,) for u in seeds], SEEDS), cfg, SPEC,
        ckpt=CKPT,
    )
    infos = rnd.run_crawl(st, max_rounds=ROUNDS)
    oracle = simulate(seeds, cfg, SPEC, max_rounds=ROUNDS)
    return st, infos, oracle


def test_redirect_crawl_order_equality(redir_pair):
    st, _, oracle = redir_pair
    got = [
        (r["round"], r["seq"], r["url"])
        for r in rnd.read_crawl_order(st).collect()
    ]
    assert got == oracle.crawl_order


def test_redirect_seen_set_equality(redir_pair):
    st, _, oracle = redir_pair
    got = {r["url_hash"]: r["url"] for r in rnd.read_final_seen(st).collect()}
    assert got == oracle.seen


def test_redirect_round_info_equality_and_301s_exist(redir_pair):
    st, infos, oracle = redir_pair
    assert [
        (i["round"], i["selected"], i["new"], i["frontier"]) for i in infos
    ] == [
        (o["round"], o["selected"], o["new"], o["frontier"])
        for o in oracle.rounds
    ]
    all_docs = st.store.read_all("documents", ROUNDS)
    n301 = all_docs.filter(F.col("status") == 301).count()
    assert n301 > 0, "universe produced no redirects — test is vacuous"


def test_redirect_edges_and_resolution(redir_pair):
    """Alias map from accumulated 301 docs matches a pure-Python walk of
    the simulator's redirect function under the same hop cap."""
    st, _, _ = redir_pair
    all_docs = st.store.read_all("documents", ROUNDS)
    edges = parse.redirect_edges(all_docs)
    got = {
        r["url"]: (r["final_url"], r["n_hops"], r["status"])
        for r in graphops.redirect_resolve(edges, max_hops=8).collect()
    }
    srcs = {r["src"]: r["dst"] for r in edges.collect()}
    assert set(got) == set(srcs)
    for src, dst in srcs.items():
        # pure-Python chase: terminal = first target that is NOT an
        # observed redirect source (matches the operator's terminal rule)
        cur, hops = dst, 1
        while cur in srcs and hops < 8:
            cur = srcs[cur]
            hops += 1
        if cur in srcs:  # still redirecting after 8 hops (or a loop)
            assert got[src] == (None, 8, "unresolved")
        else:
            assert got[src] == (cur, hops, "resolved")


def test_redirect_targets_inherit_priority_depth(spark):
    """A location span's candidate inherits parent depth/priority
    unchanged; sibling link spans step them (candidate_links path)."""
    docs = spark.createDataFrame(
        [
            (
                "http://a.example/",
                301,
                [
                    {
                        "kind": "location",
                        "text": "",
                        "media_ref": "http://b.example/x",
                        "offset": 0,
                    }
                ],
            ),
            (
                "http://c.example/",
                200,
                [
                    {
                        "kind": "link",
                        "text": "t",
                        "media_ref": "http://d.example/y",
                        "offset": 0,
                    }
                ],
            ),
        ],
        "url string, status int, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    parents = spark.createDataFrame(
        [("http://a.example/", 3, 2), ("http://c.example/", 3, 2)],
        "url string, priority int, crawl_depth int",
    )
    rows = {
        r["url"]: (r["priority"], r["crawl_depth"])
        for r in parse.candidate_links(docs, parents).collect()
    }
    assert rows["http://b.example/x"] == (3, 2)  # inherited
    assert rows["http://d.example/y"] == (4, 3)  # stepped
