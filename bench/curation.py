"""Scaling measurement for the CURATION operator family (the N vs 4N
protocol of bench/scaling.py applied to the training-data ops): inflate
the sf0.1 documents/embeddings tables deterministically to ~1M docs / 200k
vectors (no external data — copies get distinct doc_ids and a per-copy
token suffix so dedup/frequency ops see realistic near-dup structure, not
a degenerate all-identical corpus), run each operator to a count() sink at
two parallelism levels, and report per-op wall + docs/s + scaling
efficiency.

Usage:  python bench/curation.py [--pair 2,8] [--copies 200]
Prints one JSON line; humans record results in BENCH/BASELINE.md.

Same fairness config as bench/scaling.py: AQE off, explicit shuffle
partitions (= max(cores, 8)), identical input at both levels. Each level
runs in its own spark-submit process so JVM/JIT state cannot leak between
levels.
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
copies = {copies}
spark = (
    SparkSession.builder.master(f"local[{{cores}}]")
    .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
    .config("spark.sql.adaptive.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from crawlspark import simsearch, textops

base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
n_base = base.count()
# Deterministic inflation: copy c shifts doc_id by c*n_base and appends a
# per-copy token, so exact-dup collapses stay meaningful (each copy is a
# near-dup, not an exact dup, of its source) and line/PII planting stays
# per-doc deterministic.
docs = base.crossJoin(
    spark.range(copies).select(F.col("id").alias("c"))
).select(
    (F.col("doc_id") + F.col("c") * n_base).alias("doc_id"),
    F.concat(
        F.col("text"),
        F.lit(" v"),
        F.col("c").cast("string"),
        # a corpus-frequent boilerplate line on 1/3 of docs so line_dedup
        # exercises its common-line drop path, not just the df aggregate
        F.when(
            (F.col("doc_id") + F.col("c")) % 3 == 0,
            F.lit("\nsubscribe to our newsletter"),
        ).otherwise(F.lit("")),
    ).alias("text"),
    "lang",
    "source",
    "n_chars",
)
docs = docs.repartition(max(cores * 4, 16)).persist()
n_docs = docs.count()  # materialize once so op timings exclude the build

emb_base = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
n_emb_base = emb_base.count()
emb = emb_base.crossJoin(
    spark.range(max(copies // 2, 1)).select(F.col("id").alias("c"))
).select(
    (F.col("vec_id") + F.col("c") * n_emb_base).alias("vec_id"), "embedding"
).repartition(max(cores * 4, 16)).persist()
n_emb = emb.count()

# sink: force FULL computation of every output column (a bare count() lets
# Catalyst prune projection expressions -- measured 6.7M "docs/s" for the
# regex pass, i.e. nothing ran) and return an order-insensitive digest:
# SUM of xxhash64 over all stringified columns, summed as decimal(38,0).
# Not bit_xor: xor self-cancels on even multiplicities (two identical rows
# contribute 0, so "row A dropped, row B duplicated" is invisible); sum is
# order-insensitive but every duplicate shifts the total. Decimal because
# Spark 4 ANSI mode makes bigint sum overflow a hard error and 10^6 hashes
# of magnitude 2^63 overflow long almost surely; decimal(38,0) holds the
# exact sum to ~10^19 rows. The digest doubles as the cross-parallelism
# determinism check.
def sink(df):
    cols = ", ".join("cast({{0}} as string)".format(c) for c in df.columns)
    row = df.select(
        F.expr(
            "sum(cast(xxhash64({{0}}) as decimal(38,0)))".format(cols)
        ).alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return str(row["d"]), row["n"]


OPS = {{
    "pii_scrub": lambda: sink(textops.pii_scrub(docs)),
    "line_dedup": lambda: sink(textops.line_dedup(docs)),
    "token_shards": lambda: sink(
        textops.token_shards(docs, budget=4096, bucket_width=4096)
    ),
    "exact_dedup": lambda: sink(textops.exact_dedup(docs)),
    "repetition_stats": lambda: sink(textops.repetition_stats(docs)),
    "hash_sample": lambda: sink(
        textops.hash_sample(docs, {{"src0": 256, "src1": 128}}, default=64)
    ),
    "embed_quantize": lambda: sink(simsearch.embed_quantize(emb)),
    "minhash_sig": lambda: sink(textops.minhash_signatures(docs)),
    # n_shards FIXED (not cores-derived): shard assignment is part of the
    # output, so the cross-parallelism digest check requires identical
    # sharding at both levels
    "pack_sequences": lambda: sink(
        textops.pack_sequences(docs, context_len=2048, n_shards=64)
    ),
    "dup_ngram_coverage": lambda: sink(textops.dup_ngram_coverage(docs)),
}}

# warmup: compile every op's plan shape (including the digest sink) once
# at a small slice so timings measure the engine, not first-plan JIT
# (bench.py methodology)
small = docs.limit(2000).persist()
small.count()
warm_emb = emb.limit(2000).persist()
warm_emb.count()
sink(textops.pii_scrub(small))
sink(textops.line_dedup(small))
sink(textops.token_shards(small))
sink(textops.exact_dedup(small))
sink(textops.repetition_stats(small))
sink(textops.hash_sample(small, {{"src0": 256}}, default=64))
sink(simsearch.embed_quantize(warm_emb))
sink(textops.minhash_signatures(small))
sink(textops.pack_sequences(small, context_len=2048, n_shards=64))
sink(textops.dup_ngram_coverage(small))
small.unpersist()
warm_emb.unpersist()

out = {{"cores": cores, "n_docs": n_docs, "n_emb": n_emb, "ops": {{}}}}
for name, fn in OPS.items():
    t0 = time.perf_counter()
    digest, n_rows = fn()
    dt = time.perf_counter() - t0
    rows = n_emb if name == "embed_quantize" else n_docs
    out["ops"][name] = {{
        "sec": round(dt, 3),
        "rows_per_sec": round(rows / dt),
        "out_rows": n_rows,
        "digest": digest,
    }}
print("CURATION_JSON:" + json.dumps(out))
spark.stop()
"""


def run_level(cores: int, copies: int) -> dict:
    script = _WORKER.format(repo=REPO, cores=cores, copies=copies)
    path = os.path.join(REPO, "bench", f"_curation_worker_{cores}.py")
    with open(path, "w") as f:
        f.write(script)
    try:
        proc = subprocess.run(
            [sys.executable, path], capture_output=True, text=True, timeout=3600
        )
        for line in proc.stdout.splitlines():
            if line.startswith("CURATION_JSON:"):
                return json.loads(line[len("CURATION_JSON:"):])
        raise RuntimeError(
            f"worker[{cores}] produced no result; stderr tail: "
            + proc.stderr[-2000:]
        )
    finally:
        os.unlink(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pair", default="2,8")
    ap.add_argument("--copies", type=int, default=200)
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.pair.split(","))
    r_lo = run_level(lo, args.copies)
    r_hi = run_level(hi, args.copies)
    report = {
        "pair": [lo, hi],
        "n_docs": r_lo["n_docs"],
        "n_emb": r_lo["n_emb"],
        "ops": {},
    }
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
