"""Per-action profiling harness for the crawl round (guide §1: measure first).

NOT part of the frozen bench contract — bench.py is untouched. This script
re-runs the same workload as bench.py (same env vars, same config) with
SnapshotStore.write / DataFrame.collect / DataFrame.count monkeypatched to
print per-call wall times and a caller-derived label, so the ~0.5 s/job
fixed overheads inside crawl_round can be attributed to specific actions.

Usage:  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import traceback

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("SPARK_GRAFT_ROUNDS", "4"))
SF_NAME = os.path.basename(os.path.normpath(SF_DIR))


def _label() -> str:
    # innermost repo frame that is not this file
    for f in reversed(traceback.extract_stack()):
        if REPO in f.filename and "bench_extra" not in f.filename:
            return f"{os.path.basename(f.filename)}:{f.lineno}"
    return "?"


def install_probes():
    from pyspark.sql import DataFrame
    from crawlspark.io_tables import SnapshotStore

    orig_write = SnapshotStore.write
    orig_collect = DataFrame.collect
    orig_count = DataFrame.count

    def write(self, df, round_, table):
        t0 = time.perf_counter()
        orig_write(self, df, round_, table)
        print(f"    [act] write {table:<22} {time.perf_counter()-t0:6.3f}s  {_label()}")

    def collect(self):
        t0 = time.perf_counter()
        out = orig_collect(self)
        print(f"    [act] collect{'':<20} {time.perf_counter()-t0:6.3f}s  {_label()}")
        return out

    def count(self):
        t0 = time.perf_counter()
        out = orig_count(self)
        print(f"    [act] count{'':<22} {time.perf_counter()-t0:6.3f}s  {_label()}")
        return out

    SnapshotStore.write = write
    DataFrame.collect = collect
    DataFrame.count = count


def main():
    sys.path.insert(0, REPO)
    import bench as b

    spark = b.build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    b.warm_spark(spark)

    # floor check: a trivial action in this session
    t0 = time.perf_counter()
    spark.range(1000).write.format("noop").mode("overwrite").save()
    print(f"[floor] noop write of range(1000): {time.perf_counter()-t0:.3f}s")
    t0 = time.perf_counter()
    spark.range(1000).groupBy((F_id := None) or "id").count().write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"[floor] noop write with shuffle:   {time.perf_counter()-t0:.3f}s")

    install_probes()

    from crawlspark import fixtures
    from crawlspark import round as rnd
    from crawlspark.config import CrawlConfig
    from crawlspark.schemas import SEEDS

    spec = fixtures.spec_for_sf(SF_NAME)
    seeds = fixtures.seeds_for_sf(SF_NAME)
    cfg = CrawlConfig(
        max_fetches_per_host_per_round=16,
        round_capacity=None,
        shuffle_partitions=b.SHUFFLE,
        n_buckets=64,
        frontier_delta="auto",
        compact_frontier_every=8,
        bloom_mode="auto",
        fetch_arrow=False,
        async_lineage_metrics=os.environ.get("CRAWLSPARK_ASYNC", "1") == "1",
    )
    ckpt = f"/tmp/crawlspark-profile-{SF_NAME}"
    shutil.rmtree(ckpt, ignore_errors=True)
    seeds_df = spark.createDataFrame([(u,) for u in seeds], SEEDS)
    t0 = time.perf_counter()
    st = rnd.init_crawl(spark, seeds_df, cfg, spec, ckpt=ckpt)
    print(f"[init] {time.perf_counter()-t0:.3f}s")
    for r in range(1, ROUNDS + 1):
        tr = time.perf_counter()
        info = rnd.crawl_round(st, r)
        print(
            f"[round {r}] {time.perf_counter()-tr:.3f}s  selected={info['selected']}"
            f" new={info['new']} frontier={info['frontier']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
