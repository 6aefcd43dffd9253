"""Robustness + config-invariance checks (SURVEY.md §6.2.5, §8.M8)."""

import shutil

from pyspark.sql import functions as F

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS


def _outputs(spark, ckpt, cfg):
    shutil.rmtree(ckpt, ignore_errors=True)
    st = rnd.init_crawl(
        spark,
        spark.createDataFrame([(u,) for u in fixtures.seed_urls()], SEEDS),
        cfg,
        FetchSpec(),
        ckpt=ckpt,
    )
    rnd.run_crawl(st, max_rounds=2)
    order = [
        (r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st, 2).collect()
    ]
    seen = sorted(r["url"] for r in rnd.read_final_seen(st, 2).collect())
    return order, seen


def test_bucket_count_invariance(spark):
    """P (seen-set bucket count) is layout, not semantics: crawl order and
    the seen URL set must be identical at P=16 and P=64."""
    a = _outputs(spark, "/tmp/cs-rob-p16", CrawlConfig(n_buckets=16))
    b = _outputs(spark, "/tmp/cs-rob-p64", CrawlConfig(n_buckets=64))
    assert a == b


def test_bloom_capacity_growth_invariance(spark):
    """A tiny bloom capacity forces per-round bucket rebuilds — results
    must not change (growth is engine-internal), and the rebuild must be
    DISTRIBUTED: no toPandas() pulls the bucket's hashes through the driver
    (only |grow| small blob rows may cross)."""
    from pyspark.sql import DataFrame

    real_topandas = DataFrame.toPandas

    def spy(self, *a, **kw):
        raise AssertionError("driver-side toPandas() during growth rebuild")

    DataFrame.toPandas = spy
    try:
        a = _outputs(spark, "/tmp/cs-rob-cap", CrawlConfig(bloom_capacity_per_bucket=8))
    finally:
        DataFrame.toPandas = real_topandas
    b = _outputs(spark, "/tmp/cs-rob-capbig", CrawlConfig())
    assert a == b


def test_empty_seed_crawl(spark):
    shutil.rmtree("/tmp/cs-rob-empty", ignore_errors=True)
    seeds = spark.createDataFrame([("ftp://nope/",), ("not a url",)], SEEDS)
    st = rnd.init_crawl(spark, seeds, CrawlConfig(), FetchSpec(), ckpt="/tmp/cs-rob-empty")
    infos = rnd.run_crawl(st, max_rounds=2)
    assert infos[0] == {"round": 1, "selected": 0, "new": 0, "frontier": 0}


def test_frontier_drains(spark):
    """A tiny closed universe must drain: every discoverable URL fetched
    exactly once, crawl stops on its own."""
    shutil.rmtree("/tmp/cs-rob-drain", ignore_errors=True)
    spec = FetchSpec(n_hosts=3, path_space=5)
    seeds = spark.createDataFrame(
        [(f"http://h{k}.example/",) for k in range(3)], SEEDS
    )
    st = rnd.init_crawl(
        spark, seeds, CrawlConfig(max_fetches_per_host_per_round=16), spec,
        ckpt="/tmp/cs-rob-drain",
    )
    infos = rnd.run_crawl(st, max_rounds=30)
    assert infos[-1]["frontier"] == 0
    assert len(infos) < 30
    order = rnd.read_crawl_order(st).collect()
    fetched = [r["url"] for r in order]
    assert len(fetched) == len(set(fetched)), "a URL was fetched twice"
    seen = {r["url"] for r in rnd.read_final_seen(st).collect()}
    assert set(fetched) == seen, "seen set != fetched set in a drained crawl"


def test_cli_smoke(spark, tmp_path):
    from crawlspark import cli

    seeds_file = tmp_path / "seeds.txt"
    seeds_file.write_text("http://h0.example/\nhttp://h1.example/\n")
    ckpt = str(tmp_path / "ckpt")
    assert cli.main(["init", "--ckpt", ckpt, "--seeds", str(seeds_file)]) == 0
    assert cli.main(["run", "--ckpt", ckpt, "--rounds", "1"]) == 0
    assert cli.main(["status", "--ckpt", ckpt]) == 0


def test_parse_url_matches_host_of(spark):
    """Engine host extraction (JVM parse_url) ≡ oracle host extraction
    (urlnorm.host_of) on canonical URLs — the cross-implementation seam."""
    from crawlspark.urlnorm import canon_url, host_of

    raw = fixtures.seed_urls() + [
        "http://sub.h1.example/a/b",
        "https://h2.example:8443/x",
        "http://h3.example/p?q=1&r=2",
    ]
    canon = [c for c in (canon_url(u) for u in raw) if c]
    df = spark.createDataFrame([(c,) for c in canon], "url string")
    got = {
        r["url"]: r["h"]
        for r in df.select("url", F.parse_url("url", F.lit("HOST")).alias("h")).collect()
    }
    for c in canon:
        assert got[c] == host_of(c), c


def test_seen_compaction_equivalence(spark):
    """Compaction is pure layout: outputs identical with and without it,
    including across a resume that lands on a compacted snapshot."""
    a = _outputs(spark, "/tmp/cs-rob-nocompact", CrawlConfig())
    shutil.rmtree("/tmp/cs-rob-compact", ignore_errors=True)
    st = rnd.init_crawl(
        spark,
        spark.createDataFrame([(u,) for u in fixtures.seed_urls()], SEEDS),
        CrawlConfig(compact_seen_every=1),
        FetchSpec(),
        ckpt="/tmp/cs-rob-compact",
    )
    rnd.run_crawl(st, max_rounds=1)
    st2 = rnd.resume(spark, "/tmp/cs-rob-compact", CrawlConfig(compact_seen_every=1), FetchSpec())
    rnd.run_crawl(st2, max_rounds=2)
    order = [
        (r["round"], r["seq"], r["url"]) for r in rnd.read_crawl_order(st2, 2).collect()
    ]
    seen = sorted(r["url"] for r in rnd.read_final_seen(st2, 2).collect())
    assert (order, seen) == a
    assert st2.store.last_compaction(2) == 2
