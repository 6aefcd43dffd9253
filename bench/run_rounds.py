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


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _cpu_stat():
    """(steal_ticks, total_ticks) from /proc/stat — same hypervisor
    evidence bench.py records: steal% over a run's interval says whether
    a slow run was the engine or the host."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0, sum(vals))
    except Exception:
        return (0, 0)


def _steal_pct(before, after) -> float:
    ds, dt = after[0] - before[0], after[1] - before[1]
    return round(100.0 * ds / dt, 1) if dt > 0 else 0.0


def _one_run(spark, args, spec, seeds_df, cfg):
    """One full init+rounds measurement on a fresh checkpoint; returns the
    per-run record including determinism digests."""
    import time as _time

    from pyspark.sql import functions as F

    from crawlspark import round as rnd

    shutil.rmtree(args.ckpt, ignore_errors=True)
    stat0 = _cpu_stat()
    t0 = _time.perf_counter()
    st = rnd.init_crawl(spark, seeds_df, cfg, spec, ckpt=args.ckpt)
    init_sec = _time.perf_counter() - t0

    per_round = []
    urls = 0
    t0 = _time.perf_counter()
    for r in range(1, args.rounds + 1):
        tr = _time.perf_counter()
        info = rnd.crawl_round(st, r)
        per_round.append(round(_time.perf_counter() - tr, 2))
        urls += info["selected"] + info["new"]
        if info["frontier"] == 0:
            break
    wall = _time.perf_counter() - t0

    # determinism digests (A6 + crawl-order hash)
    co = rnd.read_crawl_order(st, args.rounds)
    order_digest = co.agg(
        F.expr("bit_xor(xxhash64(concat_ws('|', round, seq, url)))").alias("d")
    ).collect()[0]["d"]
    seen = rnd.read_final_seen(st, args.rounds)
    seen_row = seen.agg(
        F.count(F.lit(1)).alias("n"), F.expr("bit_xor(url_hash)").alias("d")
    ).collect()[0]
    return {
        "init_sec": round(init_sec, 2),
        "wall_sec": round(wall, 2),
        "per_round_sec": per_round,
        "urls": urls,
        "urls_per_sec": round(urls / wall, 1),
        "steal_pct": _steal_pct(stat0, _cpu_stat()),
        "crawl_order_digest": int(order_digest),
        "seen_n": int(seen_row["n"]),
        "seen_digest": int(seen_row["d"]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tier", default="scale")
    ap.add_argument("--ckpt", default="/tmp/crawlspark-scaling-ckpt")
    # JMH-style in-harness repetition (the round-5 verdict's directive:
    # scaling pairs got single-shot draws while bench.py got medians — on
    # this box single runs are bimodal under hypervisor steal bursts, so
    # a pair of single draws can fake a regression OR a pass). One
    # discarded warmup (JIT/codegen/page cache), then `repeats` measured
    # runs; the reported throughput is the MEDIAN and every run's value +
    # steal%% lands in the JSON so each draw is auditable.
    ap.add_argument(
        "--repeats",
        type=int,
        default=int(os.environ.get("CRAWLSPARK_SCALE_REPEATS", "3")),
    )
    ap.add_argument(
        "--warmup",
        type=int,
        default=int(os.environ.get("CRAWLSPARK_SCALE_WARMUP", "1")),
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    spec, seeds_df, cfg = tier_setup(spark, args.tier)

    for _ in range(max(args.warmup, 0)):
        _one_run(spark, args, spec, seeds_df, cfg)
    runs = [
        _one_run(spark, args, spec, seeds_df, cfg)
        for _ in range(max(args.repeats, 1))
    ]

    # determinism across repeats is a hard invariant — a digest that moves
    # between same-binary runs is a bug, not noise
    for k in ("crawl_order_digest", "seen_n", "seen_digest", "urls"):
        assert all(r[k] == runs[0][k] for r in runs), (
            f"non-deterministic {k} across repeats: {[r[k] for r in runs]}"
        )

    med = _median([r["urls_per_sec"] for r in runs])
    rep = min(runs, key=lambda r: abs(r["urls_per_sec"] - med))
    out = {
        "cores": cores,
        "tier": args.tier,
        "rounds": len(rep["per_round_sec"]),
        "repeats": len(runs),
        "warmup": max(args.warmup, 0),
        "init_sec": rep["init_sec"],
        "wall_sec": rep["wall_sec"],
        "per_round_sec": rep["per_round_sec"],
        "urls_scheduled_deduped": rep["urls"],
        "urls_per_sec": round(med, 1),
        "runs_urls_per_sec": [r["urls_per_sec"] for r in runs],
        "runs_steal_pct": [r["steal_pct"] for r in runs],
        "crawl_order_digest": rep["crawl_order_digest"],
        "seen_n": rep["seen_n"],
        "seen_digest": rep["seen_digest"],
    }
    spark.stop()
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
