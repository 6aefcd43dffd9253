"""Seen-set membership: Bloom pre-filter + exact anti-join (SURVEY.md §3.3 J1,
§3.10 U-3/U-4).

Two-tier J1: the broadcast per-bucket Bloom payload is probed inside an
iterator pandas UDF (one blob lookup per bucket per Arrow batch, numpy
probe over the batch's hash array) — rows the filter has definitely never
seen SKIP the exact join entirely; only the "maybe seen" remainder (true
duplicates + FPP·new) shuffles into the exact ``left_anti`` join against
the seen table. At the 10^10 design point that turns the per-round join
from O(candidates ⋈ seen) into O(duplicates ⋈ seen) — the filter is the
scale lever, the anti-join is the correctness guarantee.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from . import bloom
from .config import CrawlConfig


def maybe_seen_udf(bloom_payload_bcast):
    """U-3: iterator pandas UDF probing broadcast {bucket: (m,k,blob)} —
    a single broadcast or the sliced chain (base + deltas)."""
    chain = (
        list(bloom_payload_bcast)
        if isinstance(bloom_payload_bcast, (list, tuple))
        else [bloom_payload_bcast]
    )

    @pandas_udf(BooleanType())
    def maybe_seen(
        it: Iterator[Tuple[pd.Series, pd.Series]]
    ) -> Iterator[pd.Series]:
        payloads = [b.value for b in chain]
        for bucket_s, hash_s in it:
            yield pd.Series(
                bloom.probe_chain(payloads, bucket_s.to_numpy(), hash_s.to_numpy())
            )

    return maybe_seen


def filter_new(
    candidates: DataFrame,
    seen: DataFrame | None,
    bloom_payload_bcast,
    cfg: CrawlConfig,
) -> DataFrame:
    """Rows of `candidates` whose url_hash is not in the seen set (exact)."""
    if seen is None:
        return candidates
    if cfg.use_bloom_prefilter and bloom_payload_bcast is not None:
        probe = maybe_seen_udf(bloom_payload_bcast)
        flagged = candidates.withColumn(
            "_maybe_seen", probe(F.col("bucket"), F.col("url_hash"))
        )
        definitely_new = flagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        maybe = flagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        survived = maybe.hint("shuffle_hash").join(
            seen.select("url_hash"), "url_hash", "left_anti"
        )
        return definitely_new.unionByName(survived)
    return candidates.hint("shuffle_hash").join(
        seen.select("url_hash"), "url_hash", "left_anti"
    )


def probe_relational(cands: DataFrame, bloom_rows: DataFrame | None) -> DataFrame:
    """Executor-side Bloom probe (cfg.bloom_mode='relational'): a
    co-partitioned cogroup on `bucket` between the deduped candidates and
    the Bloom state read AS ROWS from the snapshot store — no driver-side
    registry, no sc.broadcast of any blob payload, ever.

    Each bucket's task receives the candidate slice and that bucket's blob
    rows (base + per-round deltas, possibly different (m,k) after growth)
    and ORs per-blob probes — identical semantics to probe_chain. A bucket
    with no blob rows means no key was ever inserted there: definitely new.

    Scale shape: candidates shuffle once on bucket (O(batch)); the Bloom
    side moves O(state/P) per bucket from storage to its task — distributed
    reads, nothing through the driver. At 10^10 keys the whole Bloom table
    is ~1.2 GB spread over P=4096 buckets (~290 KB/task)."""
    if bloom_rows is None:
        return cands.withColumn("maybe_seen", F.lit(True))
    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        cands.schema.fields + [StructField("maybe_seen", BooleanType(), False)]
    )
    blobs = bloom_rows.select("bucket", "blob", "m_bits", "k_hashes")

    def probe(cpdf: pd.DataFrame, bpdf: pd.DataFrame) -> pd.DataFrame:
        if len(cpdf) == 0:
            return cpdf.assign(maybe_seen=pd.Series([], dtype=bool))
        hashes = cpdf["url_hash"].to_numpy()
        flag = np.zeros(len(cpdf), dtype=bool)
        for blob, m, k in zip(bpdf["blob"], bpdf["m_bits"], bpdf["k_hashes"]):
            sel = ~flag
            if not sel.any():
                break
            flag[sel] = bloom.probe_blob(hashes[sel], bytes(blob), int(m), int(k))
        out = cpdf.copy()
        out["maybe_seen"] = flag
        return out

    return (
        cands.groupBy("bucket")
        .cogroup(blobs.groupBy("bucket"))
        .applyInPandas(probe, out_schema)
    )


def partial_bloom_blobs(new_rows: DataFrame, params_by_bucket: dict[int, tuple[int, int]],
                        default_params: tuple[int, int]) -> DataFrame:
    """U-4/A3: distributed per-bucket partial blobs of the round's NEW hashes.

    Grouped-map aggregate: one output row per bucket
    (bucket, blob, m_bits, k_hashes, n_items); the driver ORs each partial
    into its registry filter and re-broadcasts. (m,k) must match the
    bucket's current filter, so they ride in via closure.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        m, k = params_by_bucket.get(b, default_params)
        hashes = pdf["url_hash"].to_numpy()
        blob = bloom.build_blob(hashes, m, k)
        return pd.DataFrame(
            {
                "bucket": [b],
                "blob": [blob],
                "m_bits": [m],
                "k_hashes": [k],
                "n_items": [len(hashes)],
            }
        )

    # partial blobs have no capacity (that's registry state, not a property
    # of one round's delta) — so not the persisted SEEN_BLOOM schema
    partial_schema = (
        "bucket int, blob binary, m_bits long, k_hashes int, n_items long"
    )
    return new_rows.select("bucket", "url_hash").groupBy("bucket").applyInPandas(
        build, partial_schema
    )


BASE_SCHEMA = (
    "bucket int, blob binary, m_bits long, k_hashes int, n_items long, capacity int"
)


def sized_capacity(initial: int, n: int) -> int:
    """Capacity for a fresh base blob holding n keys: the configured initial
    unless n already exceeds it, then 2n (the same doubling headroom the
    growth rule leaves)."""
    return initial if n <= initial else 2 * n


def build_bloom_base(
    rows: DataFrame, caps_by_bucket: dict[int, int], fpp: float, default_capacity: int
) -> DataFrame:
    """Full base blobs (BASE_SCHEMA, capacity included) built DISTRIBUTED
    from exact (bucket, url_hash) rows — one applyInPandas task per bucket,
    nothing through the driver but the caps dict (P ints). Used by
    relational-mode init, mode-switch resume, and compaction rebuilds."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        cap = int(caps_by_bucket.get(b, default_capacity))
        m, k = bloom.bloom_params(cap, fpp)
        hashes = pdf["url_hash"].to_numpy()
        blob = bloom.build_blob(hashes, m, k)
        return pd.DataFrame(
            {
                "bucket": [b],
                "blob": [blob],
                "m_bits": [m],
                "k_hashes": [k],
                "n_items": [len(hashes)],
                "capacity": [cap],
            }
        )

    return rows.select("bucket", "url_hash").groupBy("bucket").applyInPandas(
        build, BASE_SCHEMA
    )


def merge_bloom_chain(chain: DataFrame, caps_by_bucket: dict[int, int]) -> DataFrame:
    """OR-merge each bucket's chain rows (same (m,k) within the bucket —
    the caller routes mixed-(m,k)/overflowing buckets to build_bloom_base
    instead) into one base row, distributed."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(pdf["bucket"].iloc[0])
        m = int(pdf["m_bits"].iloc[0])
        k = int(pdf["k_hashes"].iloc[0])
        bits = np.zeros(m // 8, dtype=np.uint8)
        for blob in pdf["blob"]:
            bits |= np.frombuffer(bytes(blob), dtype=np.uint8)
        return pd.DataFrame(
            {
                "bucket": [b],
                "blob": [bits.tobytes()],
                "m_bits": [m],
                "k_hashes": [k],
                "n_items": [int(pdf["n_items"].sum())],
                "capacity": [int(caps_by_bucket[b])],
            }
        )

    return chain.select(
        "bucket", "blob", "m_bits", "k_hashes", "n_items"
    ).groupBy("bucket").applyInPandas(merge, BASE_SCHEMA)
