"""Orchestrate the two-parallelism scaling measurement (BASELINE.md
protocol): package crawlspark (--py-files zip), spark-submit the identical
round job at local[8] and local[32], verify the determinism digests match,
compute scaling efficiency, and rewrite BENCH/BASELINE.md.

Usage:  python bench/scaling.py [--rounds 3] [--tier scale]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_zip() -> str:
    zpath = os.path.join(REPO, "bench", "crawlspark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for pkg in ("crawlspark", "oracle"):
            d = os.path.join(REPO, pkg)
            for name in sorted(os.listdir(d)):
                if name.endswith(".py"):
                    z.write(os.path.join(d, name), f"{pkg}/{name}")
    return zpath


def run(cores: int, zpath: str, rounds: int, tier: str) -> dict:
    env = dict(os.environ)
    # AQE is OFF for the scaling runs (same at both levels): its per-shuffle
    # driver re-optimization is pure serial latency at local scale and
    # measured -30% throughput; partition counts are set explicitly instead.
    # On a real multi-executor cluster AQE goes back ON (engine default) —
    # there its skew-split/coalesce pays for the planning cost.
    cmd = [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", f"spark.sql.shuffle.partitions={max(cores, 8)}",
        "--conf", "spark.sql.adaptive.enabled=false",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.driver.memory=48g",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version=2",
        "--py-files", zpath,
        os.path.join(REPO, "bench", "run_rounds.py"),
        "--rounds", str(rounds),
        "--tier", tier,
        "--ckpt", f"/tmp/crawlspark-scale-{cores}",
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    p = subprocess.run(cmd, capture_output=True, text=True, env=env)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:])
    raise RuntimeError(f"no RESULT line from local[{cores}] run")


def write_report(r8: dict, r32: dict, eff: float) -> None:
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    det_ok = (
        r8["crawl_order_digest"] == r32["crawl_order_digest"]
        and r8["seen_digest"] == r32["seen_digest"]
        and r8["seen_n"] == r32["seen_n"]
    )
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE.md — measured scaling (N vs 4N substitute)

Protocol: BASELINE.md §"Sandbox measurement protocol" — the same
deterministic crawl job (tier `{r8['tier']}`, {r8['rounds']} rounds, seed 42)
run via `spark-submit --py-files crawlspark.zip bench/run_rounds.py`
at two parallelism levels on identical input. Produced by bench/scaling.py.

| quantity | local[8] (N) | local[32] (4N) |
| --- | --- | --- |
| round-loop wall (s) | {r8['wall_sec']} | {r32['wall_sec']} |
| per-round (s) | {r8['per_round_sec']} | {r32['per_round_sec']} |
| URLs scheduled+deduped | {r8['urls_scheduled_deduped']} | {r32['urls_scheduled_deduped']} |
| throughput (URLs/s) | {r8['urls_per_sec']} | {r32['urls_per_sec']} |
| crawl-order digest | {r8['crawl_order_digest']} | {r32['crawl_order_digest']} |
| seen-set (n, digest) | ({r8['seen_n']}, {r8['seen_digest']}) | ({r32['seen_n']}, {r32['seen_digest']}) |

**Scaling efficiency** = (thru_32 / thru_8) / 4 = **{eff:.3f}**
(target ≥ 0.8, BASELINE.json:2).

**Determinism cross-check**: digests identical across parallelism levels:
**{'PASS' if det_ok else 'FAIL'}** — identical crawl order and URL-seen
set at 8 and 32 cores is what makes the throughput comparison
apples-to-apples (SURVEY.md §6.2.5).
""")
    print(f"wrote {path}; efficiency={eff:.3f}; determinism={'PASS' if det_ok else 'FAIL'}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tier", default="scale")
    args = ap.parse_args()
    zpath = make_zip()
    r8 = run(8, zpath, args.rounds, args.tier)
    print(json.dumps(r8), file=sys.stderr)
    r32 = run(32, zpath, args.rounds, args.tier)
    print(json.dumps(r32), file=sys.stderr)
    eff = (r32["urls_per_sec"] / r8["urls_per_sec"]) / 4.0
    write_report(r8, r32, eff)


if __name__ == "__main__":
    main()
