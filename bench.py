"""Bench harness (driver-run per round; see BASELINE.md protocol).

Headline workload = the flagship crawl loop at the scale tier named by
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1): seeds + fetch universe
sized by the tier (crawlspark.fixtures.spec_for_sf), R rounds of the full
round job (schedule → fetch → parse → dedup → advance → checkpoint), on
local[$SPARK_GRAFT_CPUS]. Primary metric (BASELINE.json:2) =
URLs scheduled+deduped per second = Σ(selected + new_unique) / wall-sec of
the round loop. Also times the headline operator queries from
__spark_entry__.queries() at the same tier.

JMH-style repetition (BENCH/BASELINE.md "steal diagnosis"): one discarded
full-scale warmup iteration, then $SPARK_GRAFT_BENCH_REPEATS measured runs
(default 3, fresh checkpoint each, identical config); the MEDIAN run is
reported with every run's throughput (runs_urls_per_sec) and per-run
hypervisor steal%% from /proc/stat (runs_steal_pct) — single runs on this
box are bimodal under 8-24%% CPU-steal bursts, so the median measures the
engine and the spread+steal columns make each draw auditable.

Prints ONE JSON line:
  {"metric": "urls_scheduled_deduped_per_sec", "value": <total_sec>,
   "unit": "sec", "queries": {...}, "sf": ..., "urls_per_sec": ...,
   "runs_urls_per_sec": [...], "repeats": 3}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_ROUNDS", "4"))
# JMH-style in-harness repetition: single runs on this box are bimodal
# (561-1,790 URLs/s across 7 same-binary runs; 23-24% hypervisor CPU steal
# measured in bursts — BENCH/BASELINE.md "steal diagnosis"). Running the
# measured loop N times with a fresh checkpoint each and reporting the
# MEDIAN makes the number measure the engine, not the hypervisor draw.
# Every run's value is recorded in the JSON (runs_urls_per_sec) so the
# spread is auditable — repetition, not cherry-picking.
REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
SF_NAME = os.path.basename(os.path.normpath(SF_DIR))


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def _cpu_stat():
    """(steal_ticks, total_ticks) from /proc/stat — the direct hypervisor
    evidence: steal% over a run's interval says whether a slow run was the
    engine or the host. Returns (0, 0) when unreadable (non-Linux)."""
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


def _default_shuffle() -> int:
    """Size shuffle partitions to the tier's round batch, not the core
    count: at sf0.1 a round moves ~12k rows, and 32 tiny stages pay more
    in fixed per-stage scheduling than they gain in parallelism (measured
    A/B at sf0.1: 8 partitions 1394 URLs/s vs 32 partitions ~1215 — the
    shuffle work itself is milliseconds either way). At the 10^10 design
    point the same rule yields thousands of partitions; this is the local
    analog, ~250 hosts (≈6k candidate rows) per partition, floor 8."""
    try:
        from crawlspark.fixtures import spec_for_sf

        return max(8, min(CPUS, spec_for_sf(SF_NAME).n_hosts // 250))
    except Exception:
        return max(CPUS, 8)


SHUFFLE = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "0")) or _default_shuffle()


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName(f"crawlspark-bench-{SF_NAME}")
        .config("spark.sql.shuffle.partitions", str(SHUFFLE))
        .config("spark.sql.adaptive.enabled", "false")  # serial driver latency at local scale; ON for real clusters
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def warm_spark(spark) -> None:
    """Steady-state warmup BEFORE any timer starts: run the REAL crawl
    chain once at toy scale (10 hosts, 2 rounds, throwaway checkpoint).
    Whole-stage codegen compiles per plan shape, so only the actual
    init/round plans warm the actual paths — measured on this box, an
    identical prepare+dedup chain runs 10.4 s cold vs 3.4 s warm, and a
    generic shuffle/UDF warmup job recovers none of it. Timed init_sec and
    crawl wall then measure the engine, not first-plan JIT + Python-worker
    spawn (JMH-style; recorded in BENCH/BASELINE.md)."""
    from crawlspark import round as rnd
    from crawlspark.config import CrawlConfig
    from crawlspark.fetch_spec import FetchSpec
    from crawlspark.schemas import SEEDS

    ckpt = "/tmp/crawlspark-bench-warmup"
    shutil.rmtree(ckpt, ignore_errors=True)
    seeds = [f"http://h{k}.example/" for k in range(10)]
    st = rnd.init_crawl(
        spark,
        spark.createDataFrame([(u,) for u in seeds], SEEDS),
        CrawlConfig(shuffle_partitions=SHUFFLE),
        FetchSpec(n_hosts=10, path_space=50),
        ckpt=ckpt,
    )
    rnd.run_crawl(st, max_rounds=2)
    shutil.rmtree(ckpt, ignore_errors=True)


def bench_crawl(spark) -> dict:
    from crawlspark import fixtures
    from crawlspark import round as rnd
    from crawlspark.config import CrawlConfig
    from crawlspark.schemas import SEEDS

    spec = fixtures.spec_for_sf(SF_NAME)
    seeds = fixtures.seeds_for_sf(SF_NAME)
    cfg = CrawlConfig(
        max_fetches_per_host_per_round=16,
        round_capacity=None,
        shuffle_partitions=SHUFFLE,
        n_buckets=64,
        frontier_delta={"1": True, "0": False}.get(
            os.environ.get("CRAWLSPARK_FRONTIER_DELTA", "auto"), "auto"
        ),
        compact_frontier_every=int(os.environ.get("CRAWLSPARK_COMPACT_EVERY", "8")),
        bloom_mode=os.environ.get("CRAWLSPARK_BLOOM_MODE", "auto"),
        fetch_arrow=os.environ.get("CRAWLSPARK_FETCH_ARROW", "0") == "1",
    )
    ckpt = f"/tmp/crawlspark-bench-{SF_NAME}-{CPUS}"
    shutil.rmtree(ckpt, ignore_errors=True)
    seeds_df = spark.createDataFrame([(u,) for u in seeds], SEEDS)

    t_init0 = time.perf_counter()
    st = rnd.init_crawl(spark, seeds_df, cfg, spec, ckpt=ckpt)
    t_init = time.perf_counter() - t_init0

    per_round = {}
    total_urls = 0
    stat0 = _cpu_stat()
    t0 = time.perf_counter()
    for r in range(1, ROUNDS + 1):
        tr = time.perf_counter()
        info = rnd.crawl_round(st, r)
        per_round[f"crawl_round_{r}"] = round(time.perf_counter() - tr, 3)
        total_urls += info["selected"] + info["new"]
        if info["frontier"] == 0:
            break
    wall = time.perf_counter() - t0
    steal = _steal_pct(stat0, _cpu_stat())
    return {
        "steal_pct": steal,
        "wall_sec": wall,
        "init_sec": t_init,
        "urls": total_urls,
        "urls_per_sec": total_urls / wall if wall > 0 else 0.0,
        "per_round": per_round,
        "ckpt": ckpt,
    }


def bench_operator_queries(spark) -> dict:
    """Median of REPEATS timings per operator query (same repetition
    rationale as the crawl loop; each timing is ~0.3-0.8 s so a single
    steal burst would otherwise dominate it)."""
    import __spark_entry__ as em

    picks = [
        "link_extract",
        "seen_antijoin",
        "host_rank_budget",
        "inround_dedup",
        "span_integrity",
    ]
    out = {}
    qs = em.queries()
    for name in picks:
        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            df.count()
            times.append(time.perf_counter() - t0)
        out[name] = round(_median(times), 3)
    return out


def main():
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    warm_spark(spark)
    # One DISCARDED full-scale iteration before the measured ones: the
    # first at-scale run is reproducibly ~2× slower in the same JVM even
    # after the toy-scale plan warmup (measured 449/1010/1929 and then
    # 953/1958/1874 across two 3-run sessions — C2 tier-up + page cache at
    # real data volume). Its throughput is still recorded below
    # (warmup_urls_per_sec) so nothing is hidden.
    warmup_run = bench_crawl(spark)
    runs = [bench_crawl(spark) for _ in range(REPEATS)]
    urls = runs[0]["urls"]
    assert all(r["urls"] == urls for r in runs), (
        "non-deterministic URL count across repeats: "
        + str([r["urls"] for r in runs])
    )
    # Representative run = the one with median wall time (so per-round
    # breakdown, wall, and urls_per_sec all come from the same run).
    med_wall = _median([r["wall_sec"] for r in runs])
    crawl = min(runs, key=lambda r: abs(r["wall_sec"] - med_wall))
    ops = bench_operator_queries(spark)
    queries = dict(crawl["per_round"])
    queries.update(ops)
    total = round(crawl["wall_sec"] + sum(ops.values()), 3)
    result = {
        "metric": "urls_scheduled_deduped_per_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": SF_NAME,
        "cpus": CPUS,
        "rounds": ROUNDS,
        "repeats": REPEATS,
        "urls_scheduled_deduped": crawl["urls"],
        "urls_per_sec": round(crawl["urls_per_sec"], 1),
        "runs_urls_per_sec": [round(r["urls_per_sec"], 1) for r in runs],
        "runs_crawl_wall_sec": [round(r["wall_sec"], 3) for r in runs],
        "runs_steal_pct": [r["steal_pct"] for r in runs],
        "warmup_urls_per_sec": round(warmup_run["urls_per_sec"], 1),
        "crawl_wall_sec": round(crawl["wall_sec"], 3),
        "init_sec": round(crawl["init_sec"], 3),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
