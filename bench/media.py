"""Scaling measurement for the MEDIA/CDC family (VERDICT r6 directive #2:
"a media-family bench row (MB/s at two parallelism levels) lands in
BENCH"): deterministic binary blobs are synthesized ON THE EXECUTORS
(spark.range → mapInPandas, no driver shipping, no external data), then
content-defined chunking (media.cdc_chunk_table) runs to a full-compute
digest sink at two parallelism levels, for BOTH engines — the vectorized
numpy gear scan (production default) and the per-byte Python reference
core. Reports MB/s per level, numpy-vs-python speedup, N→4N scaling
efficiency, and cross-engine + cross-parallelism digest equality.

Usage:  python bench/media.py [--pair 2,8] [--blobs 512] [--blob-kb 256]
Prints one JSON line; humans record results in BENCH/BASELINE.md.

Same fairness protocol as bench/curation.py: AQE off, explicit shuffle
partitions, identical input at both levels, each level in its own
spark-submit process so JVM/JIT state cannot leak between levels.
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
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

cores = {cores}
n_blobs = {blobs}
blob_bytes = {blob_kb} * 1024
avg_bits = {avg_bits}
min_len = {min_len}
max_len = {max_len}
spark = (
    SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from crawlspark import media
from crawlspark.xxh64 import hash_str


def gen(batches):
    # deterministic per-id payload, generated where it will be chunked:
    # the synth_payload PRNG recurrence over a full blob
    for pdf in batches:
        refs, payloads = [], []
        for i in pdf["id"]:
            h = hash_str(f"bench-media#{{int(i)}}") & ((1 << 63) - 1)
            arr = (
                (np.arange(blob_bytes, dtype=np.uint64) * np.uint64(h | 1))
                >> np.uint64(13)
            ).astype(np.uint8)
            refs.append(f"blob/{{int(i)}}")
            payloads.append(arr.tobytes())
        yield pd.DataFrame({{"media_ref": refs, "payload": payloads}})


blobs = (
    spark.range(n_blobs)
    .repartition(max(cores * 4, 16))
    .mapInPandas(gen, "media_ref string, payload binary")
    .persist()
)
blobs.count()  # materialize so chunking timings exclude generation
total_mb = n_blobs * blob_bytes / 1e6


def sink(df):
    cols = ", ".join("cast({{0}} as string)".format(c) for c in df.columns)
    row = df.select(
        F.expr(
            "sum(cast(xxhash64({{0}}) as decimal(38,0)))".format(cols)
        ).alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return str(row["d"]), row["n"]


# warmup both engine plans on a slice (bench.py methodology)
small = blobs.limit(8).persist()
small.count()
sink(media.cdc_chunk_table(small, engine="numpy", min_len=min_len, avg_bits=avg_bits, max_len=max_len))
sink(media.cdc_chunk_table(small, engine="python", min_len=min_len, avg_bits=avg_bits, max_len=max_len))
sink(media.cdc_chunk_table(small, engine="numpy", chunk_hash="xxh64", min_len=min_len, avg_bits=avg_bits, max_len=max_len))
small.unpersist()

out = {{"cores": cores, "n_blobs": n_blobs, "total_mb": total_mb,
       "avg_bits": avg_bits, "engines": {{}}}}
for eng, ch in (("numpy", "md5"), ("python", "md5"), ("numpy_xxh64", "xxh64")):
    t0 = time.perf_counter()
    digest, n_chunks = sink(media.cdc_chunk_table(
        blobs, engine=eng.split("_")[0], chunk_hash=ch,
        min_len=min_len, avg_bits=avg_bits, max_len=max_len))
    dt = time.perf_counter() - t0
    out["engines"][eng] = {{
        "sec": round(dt, 3),
        "mb_per_sec": round(total_mb / dt, 1),
        "n_chunks": n_chunks,
        "digest": digest,
    }}
print("MEDIA_JSON:" + json.dumps(out))
spark.stop()
"""


def run_level(cores: int, blobs: int, blob_kb: int, avg_bits: int = 6) -> dict:
    # keep the default chunk-size ratios across avg_bits: min = avg/4,
    # max = avg*2 (the 16/64/128 shape of the defaults)
    script = _WORKER.format(
        repo=REPO, cores=cores, blobs=blobs, blob_kb=blob_kb,
        avg_bits=avg_bits,
        min_len=1 << max(avg_bits - 2, 2),
        max_len=1 << (avg_bits + 1),
    )
    path = os.path.join(REPO, "bench", f"_media_worker_{cores}.py")
    with open(path, "w") as f:
        f.write(script)
    try:
        proc = subprocess.run(
            [sys.executable, path], capture_output=True, text=True, timeout=3600
        )
        for line in proc.stdout.splitlines():
            if line.startswith("MEDIA_JSON:"):
                return json.loads(line[len("MEDIA_JSON:"):])
        raise RuntimeError(
            f"worker[{cores}] produced no result; stderr tail: "
            + proc.stderr[-2000:]
        )
    finally:
        os.unlink(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="2,8")
    ap.add_argument("--blobs", type=int, default=512)
    ap.add_argument("--blob-kb", type=int, default=256)
    ap.add_argument("--avg-bits", type=int, default=6)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.pair.split(","))
    r_lo = run_level(lo, args.blobs, args.blob_kb, args.avg_bits)
    r_hi = run_level(hi, args.blobs, args.blob_kb, args.avg_bits)
    np_lo, np_hi = r_lo["engines"]["numpy"], r_hi["engines"]["numpy"]
    py_lo, py_hi = r_lo["engines"]["python"], r_hi["engines"]["python"]
    digests = {
        r["engines"][e]["digest"]
        for r in (r_lo, r_hi)
        for e in ("numpy", "python")  # md5 engines; xxh64 compared apart
    }
    xx_lo = r_lo["engines"]["numpy_xxh64"]
    xx_hi = r_hi["engines"]["numpy_xxh64"]
    report = {
        "pair": [lo, hi],
        "avg_bits": args.avg_bits,
        "total_mb": r_lo["total_mb"],
        "numpy": {
            f"mbps_{lo}": np_lo["mb_per_sec"],
            f"mbps_{hi}": np_hi["mb_per_sec"],
            "efficiency": round(
                (np_hi["mb_per_sec"] / np_lo["mb_per_sec"]) / (hi / lo), 3
            ),
        },
        "python": {
            f"mbps_{lo}": py_lo["mb_per_sec"],
            f"mbps_{hi}": py_hi["mb_per_sec"],
            "efficiency": round(
                (py_hi["mb_per_sec"] / py_lo["mb_per_sec"]) / (hi / lo), 3
            ),
        },
        "numpy_speedup": round(
            np_hi["mb_per_sec"] / py_hi["mb_per_sec"], 2
        ),
        "numpy_xxh64": {
            f"mbps_{lo}": xx_lo["mb_per_sec"],
            f"mbps_{hi}": xx_hi["mb_per_sec"],
        },
        "n_chunks": np_lo["n_chunks"],
        "digest_match": len(digests) == 1
        and np_lo["n_chunks"] == np_hi["n_chunks"] == py_lo["n_chunks"]
        and xx_lo["n_chunks"] == xx_hi["n_chunks"] == np_lo["n_chunks"]
        and xx_lo["digest"] == xx_hi["digest"],
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
