"""Orchestrate the two-parallelism scaling measurement (BASELINE.md
protocol): package crawlspark (--py-files zip), spark-submit the identical
round job at local[N] and local[4N], verify the determinism digests match,
compute scaling efficiency, and rewrite BENCH/BASELINE.md.

Usage:  python bench/scaling.py [--rounds 2] [--tier scale] [--pair 2,8]
Env:    CRAWLSPARK_SCALE_HOSTS (default 250000; the headline 1M-host
        tier sets 1000000), CRAWLSPARK_SCALE_SPANS (default 8)

Config notes (same at BOTH levels, so the comparison stays fair):
- AQE OFF: its per-shuffle driver re-optimization is pure serial latency at
  local scale (measured -30% throughput); explicit partition counts instead.
  On a real multi-executor cluster AQE goes back ON (engine default).
- file-output-committer v2: per-task renames instead of a serial driver
  rename pass.
- Pair default (2, 8): on a single box, disk and memory bandwidth are
  SHARED resources — raw-Spark probes show local-mode shuffle tops out at
  ~2x from 8->32 cores regardless of workload, so (8,32) measures the
  machine, not the engine. (2,8) keeps the 4N level inside the box's
  bandwidth envelope. BENCH/BASELINE.md reports every measured pair.
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


def run(
    cores: int, zpath: str, rounds: int, tier: str, repeats: int = 3,
    warmup: int = 1,
) -> dict:
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
        "--repeats", str(repeats),
        "--warmup", str(warmup),
    ]
    print("+", " ".join(cmd), file=sys.stderr)
    p = subprocess.run(cmd, capture_output=True, text=True)
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    sys.stderr.write(p.stdout[-4000:] + "\n" + p.stderr[-4000:])
    raise RuntimeError(f"no RESULT line from local[{cores}] run")


def write_report(rn: dict, r4n: dict, eff: float, extra_rows: str = "") -> None:
    # PREPEND the fresh pair to BENCH/BASELINE.md — the file carries
    # hand-curated measurement history below, which a plain rewrite would
    # destroy (it did, once; the history was restored from git)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    existing = ""
    if os.path.exists(path):
        with open(path) as f:
            existing = f.read()
    det_ok = (
        rn["crawl_order_digest"] == r4n["crawl_order_digest"]
        and rn["seen_digest"] == r4n["seen_digest"]
        and rn["seen_n"] == r4n["seen_n"]
    )
    with open(path, "w") as f:
        f.write(f"""# BENCH/BASELINE.md — measured scaling (N vs 4N substitute)

Protocol: BASELINE.md §"Sandbox measurement protocol" — the same
deterministic crawl job (tier `{rn['tier']}`, {rn['rounds']} rounds, seed 42)
run via `spark-submit --py-files crawlspark.zip bench/run_rounds.py`
at two parallelism levels on identical input. Produced by bench/scaling.py.

| quantity | local[{rn['cores']}] (N) | local[{r4n['cores']}] (4N) |
| --- | --- | --- |
| round-loop wall (s, median run) | {rn['wall_sec']} | {r4n['wall_sec']} |
| per-round (s, median run) | {rn['per_round_sec']} | {r4n['per_round_sec']} |
| URLs scheduled+deduped | {rn['urls_scheduled_deduped']} | {r4n['urls_scheduled_deduped']} |
| throughput (URLs/s, median of {rn.get('repeats', 1)}) | {rn['urls_per_sec']} | {r4n['urls_per_sec']} |
| per-run throughput (URLs/s) | {rn.get('runs_urls_per_sec', [rn['urls_per_sec']])} | {r4n.get('runs_urls_per_sec', [r4n['urls_per_sec']])} |
| per-run steal % | {rn.get('runs_steal_pct', ['n/a'])} | {r4n.get('runs_steal_pct', ['n/a'])} |
| crawl-order digest | {rn['crawl_order_digest']} | {r4n['crawl_order_digest']} |
| seen-set (n, digest) | ({rn['seen_n']}, {rn['seen_digest']}) | ({r4n['seen_n']}, {r4n['seen_digest']}) |

**Scaling efficiency** = (thru_4N / thru_N) / 4 = **{eff:.3f}**
(target ≥ 0.8, BASELINE.json:2). Each level is a MEDIAN of
{rn.get('repeats', 1)} same-JVM measured runs after {rn.get('warmup', 0)}
discarded warmup (JMH discipline, matching bench.py — single draws on
this box are bimodal under hypervisor steal bursts; the per-run rows
above make every draw auditable, and digests are asserted identical
across repeats inside the harness).

**Determinism cross-check**: digests identical across parallelism levels:
**{'PASS' if det_ok else 'FAIL'}** — identical crawl order and URL-seen
set at both levels is what makes the throughput comparison
apples-to-apples (SURVEY.md §6.2.5).
{extra_rows}""")
        if existing:
            f.write("\n---\n\n## Prior content (preserved)\n\n" + existing)
    print(f"wrote {path}; efficiency={eff:.3f}; determinism={'PASS' if det_ok else 'FAIL'}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--tier", default="scale")
    ap.add_argument("--pair", default="2,8", help="N,4N core counts")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    args = ap.parse_args()
    n, n4 = (int(x) for x in args.pair.split(","))
    zpath = make_zip()
    rn = run(n, zpath, args.rounds, args.tier, args.repeats, args.warmup)
    print(json.dumps(rn), file=sys.stderr)
    r4n = run(n4, zpath, args.rounds, args.tier, args.repeats, args.warmup)
    print(json.dumps(r4n), file=sys.stderr)
    eff = (r4n["urls_per_sec"] / rn["urls_per_sec"]) / 4.0
    write_report(rn, r4n, eff)


if __name__ == "__main__":
    main()
