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
