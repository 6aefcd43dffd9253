"""U-5 fetch stage: Arrow-batched mapInPandas over host-hash-partitioned
batches (SURVEY.md §3.1 S8, §3.10 U-5).

Politeness is enforced ENTIRELY by the scheduler (per-host budgets + round
slots, rank.py) — by the time rows reach the fetch stage every host has at
most B_h URLs in flight for the round, exactly like the batches heroshi's
manager hands to io-worker (recalled, SURVEY.md §0). The fetch stage
therefore only needs parallel execution, not per-host function calls:
rows are hash-repartitioned by (host_hash, salt) and sorted by host within
each partition, so one Arrow batch carries contiguous per-host runs (a
production HTTP client can reuse connections per host), but the Python
function runs once per ~10k-row Arrow batch instead of once per host —
at 2000 hosts/round that is ~60 batch calls instead of 2000 group calls
(measured 5.5s → sub-second at the sf0.1 tier).

In-sandbox the body is the deterministic fetch simulator (fetch_spec.py);
production swap-in: an async HTTP client inside the same iterator function.
Spans return to the JVM as Arrow list<struct> — verified lossless on Spark
4.1.2 (SURVEY.md §8 hard-part c).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from . import fetch_spec
from .schemas import DOCUMENTS


def fetch_selected(
    selected: DataFrame,
    round_: int,
    spec: fetch_spec.FetchSpec,
    parallelism: int | None = None,
) -> DataFrame:
    """selected (needs url, url_hash, host_hash, salt) → DOCUMENTS rows."""
    n = parallelism or selected.sparkSession.sparkContext.defaultParallelism

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "url": [], "fetch_round": [], "status": [],
                "spans": [], "parent_priority": [], "parent_depth": [],
            }
            for url, url_hash, prio, depth in zip(
                pdf["url"], pdf["url_hash"], pdf["priority"], pdf["crawl_depth"]
            ):
                status, spans = fetch_spec.simulate_fetch(url, spec)
                out["doc_id"].append(fetch_spec.doc_id_of(url_hash))
                out["url"].append(url)
                out["fetch_round"].append(round_)
                out["status"].append(status)
                out["spans"].append(spans)
                out["parent_priority"].append(int(prio))
                out["parent_depth"].append(int(depth))
            yield pd.DataFrame(out)

    return (
        selected.select("url", "url_hash", "host_hash", "salt", "priority", "crawl_depth")
        .repartition(n, "host_hash", "salt")
        .sortWithinPartitions("host_hash", "url_hash")
        .mapInPandas(fetch_batches, DOCUMENTS)
    )
