"""Parallelism invariance (SURVEY.md §6.2.5): the crawl's outputs must be
bit-identical under different shuffle-partition counts — the property that
makes the N-vs-4N scaling comparison apples-to-apples. (The cross-core
check — local[8] vs local[32] — runs in bench/scaling.py via spark-submit
and is recorded in BENCH/BASELINE.md.)"""

import shutil

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS


def _crawl_outputs(spark, ckpt, shuffle_partitions):
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        shutil.rmtree(ckpt, ignore_errors=True)
        st = rnd.init_crawl(
            spark,
            spark.createDataFrame([(u,) for u in fixtures.seed_urls()], SEEDS),
            CrawlConfig(),
            FetchSpec(),
            ckpt=ckpt,
        )
        rnd.run_crawl(st, max_rounds=2)
        order = [
            (r["round"], r["seq"], r["url"])
            for r in rnd.read_crawl_order(st, 2).collect()
        ]
        seen = sorted(
            (r["url_hash"], r["url"]) for r in rnd.read_final_seen(st, 2).collect()
        )
        return order, seen
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")


def test_shuffle_partition_invariance(spark):
    a = _crawl_outputs(spark, "/tmp/crawlspark-inv-a", 4)
    b = _crawl_outputs(spark, "/tmp/crawlspark-inv-b", 17)
    assert a == b


def test_round5_query_invariance(spark):
    """Round-5 queries are bit-identical under different shuffle-partition
    counts (sorted-row comparison at sf0.001): path-doubling resolution,
    snapshot stats, the closed refresh loop, trap detection, fingerprints."""
    import __spark_entry__ as entry

    names = (
        "redirect_resolve",
        "snapshot_change",
        "observed_recrawl",
        "url_trap_stats",
        "content_fingerprints",
        # round 6
        "recrawl_enqueue",
        "pagerank_boosts_rel",
        "url_trap_stats_approx",
        "mix_weights",
        "pack_sequences",
        # round 7
        "simhash_pairs",
        "host_opic",
        "boilerplate_cut",
        "hashed_tfidf",
        "topic_scores",
    )
    q = entry.queries()

    def run_all(parts):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
            return {
                n: sorted(map(tuple, q[n](spark, "/root/testdata/sf0.001").collect()))
                for n in names
            }
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")

    a = run_all(4)
    b = run_all(17)
    for n in names:
        assert a[n] == b[n], n
        assert a[n], f"{n} returned no rows — invariance check is vacuous"
