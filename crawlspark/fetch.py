"""U-5 fetch stage: grouped-map pandas UDF over (host_hash, salt) batches
(SURVEY.md §3.1 S8, §3.10 U-5).

The group key mirrors the politeness unit: one pandas batch = one host's
(salted) fetch batch, exactly the granularity heroshi's io-worker receives
on stdin (recalled, SURVEY.md §0). In-sandbox the batch function calls the
deterministic fetch simulator (fetch_spec.py); in production the same
function body would drive an async HTTP client — the engine-side contract
(input: url/url_hash rows; output: DOCUMENTS rows with interleaved span
arrays) is identical.

Spans travel back to the JVM as Arrow list<struct> — verified lossless on
Spark 4.1.2 (SURVEY.md §8 hard-part c).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

from . import fetch_spec
from .schemas import DOCUMENTS


def fetch_selected(
    selected: DataFrame, round_: int, spec: fetch_spec.FetchSpec
) -> DataFrame:
    """selected (needs url, url_hash, host_hash, salt) → DOCUMENTS rows."""

    def fetch_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        urls = pdf["url"].tolist()
        hashes = pdf["url_hash"].tolist()
        out = {"doc_id": [], "url": [], "fetch_round": [], "status": [], "spans": []}
        for url, url_hash in zip(urls, hashes):
            status, spans = fetch_spec.simulate_fetch(url, spec)
            out["doc_id"].append(fetch_spec.doc_id_of(url_hash))
            out["url"].append(url)
            out["fetch_round"].append(round_)
            out["status"].append(status)
            out["spans"].append(spans)
        return pd.DataFrame(out)

    return (
        selected.select("url", "url_hash", "host_hash", "salt")
        .groupBy("host_hash", "salt")
        .applyInPandas(fetch_batch, DOCUMENTS)
    )
