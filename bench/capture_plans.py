"""Capture `.explain("formatted")` output for the operators touched in
round 8 (judge deliverable: plans/r08/<name>_{before,after}.txt).

Run from either tree (the round-start commit via a git worktree for the
"before" side, HEAD for "after"):

    python bench/capture_plans.py /root/repo/plans/r08 after

Captures:
- hashed_tfidf / topic_scores via queries() at sf0.01 (the driver tier);
- the crawl round's per-table write plans (crawl_order / documents /
  seen_delta / bloom / frontier / lineage / metrics) at steady state
  (round 2 of a 20-host toy crawl), by wrapping SnapshotStore.write.
"""

from __future__ import annotations

import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT_DIR = sys.argv[1]
TAG = sys.argv[2]  # "before" | "after"
os.makedirs(OUT_DIR, exist_ok=True)


def formatted(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def save(name: str, text: str) -> None:
    with open(os.path.join(OUT_DIR, f"{name}_{TAG}.txt"), "w") as f:
        f.write(text)
    print(f"saved {name}_{TAG}.txt ({len(text.splitlines())} lines)")


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as em

    qs = em.queries()
    for name in ("hashed_tfidf", "topic_scores"):
        save(name, formatted(qs[name](spark, "/root/testdata/sf0.01")))

    # crawl round write plans at steady state (round 2)
    from crawlspark import round as rnd
    from crawlspark.config import CrawlConfig
    from crawlspark.io_tables import SnapshotStore
    from crawlspark.fetch_spec import FetchSpec
    from crawlspark.schemas import SEEDS

    captured: dict[str, str] = {}
    orig_write = SnapshotStore.write

    def write(self, df, round_, table):
        if round_ == 2 and table not in captured:
            try:
                captured[table] = formatted(df)
            except Exception as exc:  # pragma: no cover
                captured[table] = f"explain failed: {exc}"
        orig_write(self, df, round_, table)

    SnapshotStore.write = write
    ckpt = f"/tmp/crawlspark-plans-{TAG}"
    shutil.rmtree(ckpt, ignore_errors=True)
    seeds = [f"http://h{k}.example/" for k in range(20)]
    st = rnd.init_crawl(
        spark,
        spark.createDataFrame([(u,) for u in seeds], SEEDS),
        CrawlConfig(max_fetches_per_host_per_round=16, round_capacity=None),
        FetchSpec(n_hosts=20, path_space=500),
        ckpt=ckpt,
    )
    rnd.run_crawl(st, max_rounds=2)
    SnapshotStore.write = orig_write
    for table, text in captured.items():
        save(f"crawl_round2_{table}", text)
    shutil.rmtree(ckpt, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
