"""Scaling measurement for the GRAPH operator family (the N vs 4N protocol
of bench/curation.py applied to graphops): synthesize a deterministic
functional redirect graph and a near-dup pair graph from spark.range (no
external data), run redirect_resolve and connected_components to a digest
sink at two parallelism levels, and report per-op wall + rows/s + scaling
efficiency + the cross-parallelism digest check.

Graph shapes (size --nodes, default 4M):
- redirects: the mod-16 construction of the redirect_resolve driver query
  (chains up to 12 deep into 16k terminals, 3-cycles at j=13..15) over
  string URLs — ~15/16 of nodes are redirect sources.
- pairs: chain edges (i -> i+1 within 64-blocks) + hash-derived cross
  links, so components have bounded diameter and CC converges in
  O(log d) iterations at both levels.

Usage:  python bench/graph.py [--pair 1,4] [--nodes 4000000]
Prints one JSON line; humans record results in BENCH/BASELINE.md.
Same fairness config as bench/curation.py: AQE off, explicit shuffle
partitions (= max(cores, 8)), identical input at both levels, each level
in its own process.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession, functions as F

cores = {cores}
n_nodes = {nodes}
spark = (
    SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from crawlspark import graphops

def url(c):
    return F.concat(F.lit("http://h"), F.pmod(c, F.lit(23)).cast("string"),
                    F.lit(".example/r/"), c.cast("string"))

def redirect_edges(n):
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    j = F.pmod(F.col("doc_id"), F.lit(16))
    dst_id = (F.when(j.isin(13, 14), F.col("doc_id") + 1)
               .when(j == 15, F.col("doc_id") - 2)
               .otherwise(F.col("doc_id") - 1))
    return ids.filter(j != 0).select(url(F.col("doc_id")).alias("src"),
                                     url(dst_id).alias("dst"))

def pair_edges(n):
    # 64-node chain blocks + hash-derived links WITHIN each block: the
    # bounded-diameter cluster shape real near-dup graphs have (and the
    # regime connected_components' O(log d) budget is designed for)
    ids = spark.range(n)
    chain = ids.filter(F.pmod(F.col("id"), F.lit(64)) != 63).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    block_start = F.col("id") - F.pmod(F.col("id"), F.lit(64))
    cross = ids.filter(F.pmod(F.col("id"), F.lit(7)) == 0).select(
        F.col("id").alias("src"),
        (block_start + F.pmod(F.xxhash64(F.col("id")), F.lit(64))).alias("dst"))
    return chain.unionByName(cross.filter(F.col("dst") < n))

def sink(df):
    row = df.select(
        F.sum(F.xxhash64(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns]))
              .cast("decimal(38,0)")).alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return str(row["d"]), row["n"]

# warmup at a small slice: plan shapes + JIT, not the measurement
sink(graphops.redirect_resolve(redirect_edges(20000)))
sink(graphops.connected_components(pair_edges(20000)).select("node", "component"))

out = {{"cores": cores, "n_nodes": n_nodes, "ops": {{}}}}

re_full = redirect_edges(n_nodes)
n_edges = re_full.count()
t0 = time.perf_counter()
digest, n_rows = sink(graphops.redirect_resolve(re_full))
dt = time.perf_counter() - t0
out["ops"]["redirect_resolve"] = {{
    "sec": round(dt, 3), "rows_per_sec": round(n_edges / dt),
    "in_rows": n_edges, "out_rows": n_rows, "digest": digest,
}}

pe_full = pair_edges(n_nodes)
n_pe = pe_full.count()
t0 = time.perf_counter()
digest, n_rows = sink(
    graphops.connected_components(pe_full).select("node", "component"))
dt = time.perf_counter() - t0
out["ops"]["connected_components"] = {{
    "sec": round(dt, 3), "rows_per_sec": round(n_pe / dt),
    "in_rows": n_pe, "out_rows": n_rows, "digest": digest,
}}
print("GRAPH_JSON:" + json.dumps(out))
spark.stop()
"""


def run_level(cores: int, nodes: int) -> dict:
    script = _WORKER.format(repo=REPO, cores=cores, nodes=nodes)
    path = os.path.join(REPO, "bench", f"_graph_worker_{cores}.py")
    with open(path, "w") as f:
        f.write(script)
    try:
        proc = subprocess.run(
            [sys.executable, path], capture_output=True, text=True, timeout=3600
        )
        for line in proc.stdout.splitlines():
            if line.startswith("GRAPH_JSON:"):
                return json.loads(line[len("GRAPH_JSON:"):])
        raise RuntimeError(
            f"worker[{cores}] produced no result; stderr tail: "
            + proc.stderr[-2000:]
        )
    finally:
        os.unlink(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="1,4")
    ap.add_argument("--nodes", type=int, default=4_000_000)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.pair.split(","))
    r_lo = run_level(lo, args.nodes)
    r_hi = run_level(hi, args.nodes)
    report = {"pair": [lo, hi], "n_nodes": args.nodes, "ops": {}}
    for name in r_lo["ops"]:
        a, b = r_lo["ops"][name], r_hi["ops"][name]
        eff = (b["rows_per_sec"] / a["rows_per_sec"]) / (hi / lo)
        report["ops"][name] = {
            f"rps_{lo}": a["rows_per_sec"],
            f"rps_{hi}": b["rows_per_sec"],
            f"sec_{lo}": a["sec"],
            f"sec_{hi}": b["sec"],
            "efficiency": round(eff, 3),
            "digest_match": a["digest"] == b["digest"]
            and a["out_rows"] == b["out_rows"],
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
