"""spark-submit entry point for the scaling benchmark (SURVEY.md §8.M7,
BASELINE.md measurement protocol).

Run via:

    spark-submit --master local[8]  --py-files crawlspark.zip \
        bench/run_rounds.py --rounds 3 --tier scale --ckpt /tmp/ck8
    spark-submit --master local[32] --py-files crawlspark.zip \
        bench/run_rounds.py --rounds 3 --tier scale --ckpt /tmp/ck32

Identical input (deterministic seed universe, fixed seed 42), identical
config except parallelism; prints ONE JSON line with wall time, URLs
scheduled+deduped, throughput, and the crawl-order + seen-set digests —
the digests MUST match across parallelism levels (determinism is what
makes the N→4N throughput comparison apples-to-apples, SURVEY.md §6.2.5).

The `scale` tier sizes the universe so per-round work is compute-bound
(hundreds of thousands of URLs canonicalized/hashed/scheduled per round),
which is the regime the 10^10 design point lives in — local-mode
per-stage scheduling latency is parallelism-independent and would
otherwise swamp an 8-vs-32-core comparison at toy sizes.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


SCALE_HOSTS = int(os.environ.get("CRAWLSPARK_SCALE_HOSTS", "250000"))


def tier_setup(spark, tier: str):
    """(spec, seeds_df, cfg) — scale-tier seeds are generated DISTRIBUTED
    (spark.range + hash projections, no driver-side list) so seed ingest is
    itself O(cores)."""
    from pyspark.sql import functions as F

    from crawlspark import fixtures
    from crawlspark.config import CrawlConfig
    from crawlspark.fetch_spec import FetchSpec
    from crawlspark.schemas import SEEDS

    if tier == "scale":
        n = SCALE_HOSTS
        spec = FetchSpec(n_hosts=n, path_space=max(500000, n * 2), max_spans=int(os.environ.get("CRAWLSPARK_SCALE_SPANS", "8")))
        roots = spark.range(0, n).select(
            F.concat(F.lit("http://h"), F.col("id").cast("string"), F.lit(".example/")).alias("url")
        )
        deep = spark.range(0, n).select(
            F.concat(
                F.lit("http://h"),
                F.pmod(F.xxhash64(F.concat(F.lit("ss#"), F.col("id").cast("string"))), F.lit(n)).cast("string"),
                F.lit(".example/seed/"),
                F.pmod(F.xxhash64(F.concat(F.lit("sm#"), F.col("id").cast("string"))), F.lit(1000)).cast("string"),
            ).alias("url")
        )
        seeds_df = roots.unionByName(deep)
        cfg = CrawlConfig(
            max_fetches_per_host_per_round=16,
            round_capacity=None,
            n_buckets=64,
            bloom_capacity_per_bucket=1 << 18,
            fetch_arrow=os.environ.get("CRAWLSPARK_FETCH_ARROW", "1") == "1",
            frontier_delta={"1": True, "0": False}.get(
                os.environ.get("CRAWLSPARK_FRONTIER_DELTA", "auto"), "auto"
            ),
            bloom_mode=os.environ.get("CRAWLSPARK_BLOOM_MODE", "auto"),
        )
        return spec, seeds_df, cfg
    # sf-named tiers reuse the fixture universe
    spec = fixtures.spec_for_sf(tier)
    seeds = fixtures.seeds_for_sf(tier)
    seeds_df = spark.createDataFrame([(u,) for u in seeds], SEEDS)
    return spec, seeds_df, CrawlConfig(round_capacity=200_000)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tier", default="scale")
    ap.add_argument("--ckpt", default="/tmp/crawlspark-scaling-ckpt")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from crawlspark import round as rnd

    spec, seeds_df, cfg = tier_setup(spark, args.tier)
    shutil.rmtree(args.ckpt, ignore_errors=True)

    t0 = time.perf_counter()
    st = rnd.init_crawl(spark, seeds_df, cfg, spec, ckpt=args.ckpt)
    init_sec = time.perf_counter() - t0

    per_round = []
    urls = 0
    t0 = time.perf_counter()
    for r in range(1, args.rounds + 1):
        tr = time.perf_counter()
        info = rnd.crawl_round(st, r)
        per_round.append(round(time.perf_counter() - tr, 2))
        urls += info["selected"] + info["new"]
        if info["frontier"] == 0:
            break
    wall = time.perf_counter() - t0

    # determinism digests (A6 + crawl-order hash)
    co = rnd.read_crawl_order(st, args.rounds)
    order_digest = co.agg(
        F.expr("bit_xor(xxhash64(concat_ws('|', round, seq, url)))").alias("d")
    ).collect()[0]["d"]
    seen = rnd.read_final_seen(st, args.rounds)
    seen_row = seen.agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(url_hash)").alias("d")
    ).collect()[0]

    out = {
        "cores": cores,
        "tier": args.tier,
        "rounds": len(per_round),
        "init_sec": round(init_sec, 2),
        "wall_sec": round(wall, 2),
        "per_round_sec": per_round,
        "urls_scheduled_deduped": urls,
        "urls_per_sec": round(urls / wall, 1),
        "crawl_order_digest": int(order_digest),
        "seen_n": int(seen_row["n"]),
        "seen_digest": int(seen_row["d"]),
    }
    spark.stop()
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
