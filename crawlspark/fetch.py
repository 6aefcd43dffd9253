"""U-5 fetch stage: Arrow-native mapInArrow over host-hash-partitioned
batches (SURVEY.md §3.1 S8, §3.10 U-5).

Politeness is enforced ENTIRELY by the scheduler (per-host budgets + round
slots, rank.py) — by the time rows reach the fetch stage every host has at
most B_h URLs in flight for the round, exactly like the batches heroshi's
manager hands to io-worker (recalled, SURVEY.md §0). The fetch stage
therefore only needs parallel execution, not per-host function calls:
rows are hash-repartitioned by (host_hash, salt) and sorted by host within
each partition, so one Arrow batch carries contiguous per-host runs (a
production HTTP client can reuse connections per host).

Two interchangeable implementations (cfg.fetch_arrow selects; identical
output, same digests): ``fetch_selected_pandas`` (mapInPandas — spans as
object columns of dicts, pandas→Arrow conversion in C++) and
``fetch_selected`` (mapInArrow — ListArray(StructArray) from flat python
builders). MEASURED at the 250k-host/16-span tier, local[8]: the pandas
variant wins (fetch section 16.7s/34.3s vs 23.5s/48.8s per round) — the
C++ dict→struct conversion beats pure-python flat appends. Default is
pandas; the arrow variant is kept for environments where pandas object
columns are the bottleneck.

In-sandbox the body is the deterministic fetch simulator (fetch_spec.py);
production swap-in: an async HTTP client inside the same iterator function.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame

from . import fetch_spec
from .schemas import DOCUMENTS

_SPAN_PA = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)

_DOCS_PA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("url", pa.string()),
        pa.field("fetch_round", pa.int32()),
        pa.field("status", pa.int32()),
        pa.field("spans", pa.list_(_SPAN_PA)),
        pa.field("parent_priority", pa.int32()),
        pa.field("parent_depth", pa.int32()),
    ]
)


def fetch_selected_pandas(
    selected: DataFrame,
    round_: int,
    spec: fetch_spec.FetchSpec,
    parallelism: int | None = None,
) -> DataFrame:
    """mapInPandas variant (A/B alternative): spans as object columns of
    dicts; pandas→Arrow conversion happens in C++."""
    import pandas as pd

    n = parallelism or selected.sparkSession.sparkContext.defaultParallelism

    def fetch_batches(batches):
        for pdf in batches:
            out = {
                "doc_id": [], "url": [], "fetch_round": [], "status": [],
                "spans": [], "parent_priority": [], "parent_depth": [],
            }
            for url, url_hash, prio, depth in zip(
                pdf["url"], pdf["url_hash"], pdf["priority"], pdf["crawl_depth"]
            ):
                status, spans = fetch_spec.simulate_fetch(url, spec, round_)
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


def fetch_selected(
    selected: DataFrame,
    round_: int,
    spec: fetch_spec.FetchSpec,
    parallelism: int | None = None,
) -> DataFrame:
    """selected (needs url, url_hash, host_hash, salt, priority,
    crawl_depth) → DOCUMENTS rows."""
    n = parallelism or selected.sparkSession.sparkContext.defaultParallelism

    def fetch_batches(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column("url").to_pylist()
            hashes = batch.column("url_hash").to_pylist()
            prios = batch.column("priority").to_pylist()
            depths = batch.column("crawl_depth").to_pylist()
            doc_ids: list[str] = []
            statuses: list[int] = []
            # flat span builders + list offsets
            s_kind: list[str] = []
            s_text: list[str | None] = []
            s_ref: list[str | None] = []
            s_off: list[int] = []
            offsets: list[int] = [0]
            validity: list[bool] = []
            for url, url_hash in zip(urls, hashes):
                status, spans = fetch_spec.simulate_fetch(url, spec, round_)
                doc_ids.append(fetch_spec.doc_id_of(url_hash))
                statuses.append(status)
                if spans is None:
                    validity.append(False)
                    offsets.append(offsets[-1])
                    continue
                validity.append(True)
                for s in spans:
                    s_kind.append(s["kind"])
                    s_text.append(s["text"])
                    s_ref.append(s["media_ref"])
                    s_off.append(s["offset"])
                offsets.append(offsets[-1] + len(spans))
            struct_arr = pa.StructArray.from_arrays(
                [
                    pa.array(s_kind, pa.string()),
                    pa.array(s_text, pa.string()),
                    pa.array(s_ref, pa.string()),
                    pa.array(s_off, pa.int32()),
                ],
                fields=list(_SPAN_PA),
            )
            spans_arr = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()),
                struct_arr,
                mask=pa.array([not v for v in validity], pa.bool_()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(doc_ids, pa.string()),
                    batch.column("url"),
                    pa.array([round_] * len(urls), pa.int32()),
                    pa.array(statuses, pa.int32()),
                    spans_arr,
                    pa.array([int(p) for p in prios], pa.int32()),
                    pa.array([int(d) for d in depths], pa.int32()),
                ],
                schema=_DOCS_PA,
            )

    return (
        selected.select("url", "url_hash", "host_hash", "salt", "priority", "crawl_depth")
        .repartition(n, "host_hash", "salt")
        .sortWithinPartitions("host_hash", "url_hash")
        .mapInArrow(fetch_batches, DOCUMENTS)
    )


def revalidate(docs: DataFrame, validators: DataFrame, fp_col=None) -> DataFrame:
    """Conditional-refetch classification (config.conditional_fetch):
    ``validators`` is (url, _validator) — the cached content fingerprint
    per URL (NULL/absent = no cached copy). A status-200 row whose
    current fingerprint equals its validator becomes **304 Not Modified
    with an EMPTY span array** (slice(spans, 1, 0) keeps the exact span
    struct type), so nothing is re-stored or re-parsed downstream.

    ``fp_col`` defaults to the crawl path's xxhash64 content fingerprint
    (parse.content_fingerprint); the driver query passes the md5 twin of
    the same content_record serialization so DuckDB can mirror the
    classification byte-for-byte.

    Scale shape: one left join keyed on url — the validator side is the
    recrawl_state slice (refetch-cardinality at steady state), AQE picks
    broadcast vs shuffle; the rewrite is per-row codegen."""
    from pyspark.sql import functions as F

    from .parse import content_fingerprint

    fp = fp_col if fp_col is not None else content_fingerprint(F.col("spans"))
    not_mod = (
        (F.col("status") == 200)
        & F.col("_validator").isNotNull()
        & (fp == F.col("_validator"))
    )
    return (
        docs.join(validators, "url", "left")
        .withColumn(
            "status",
            F.when(not_mod, F.lit(304)).otherwise(F.col("status")).cast("int"),
        )
        .withColumn(
            "spans",
            F.when(F.col("status") == 304, F.slice(F.col("spans"), 1, 0))
            .otherwise(F.col("spans")),
        )
        .drop("_validator")
    )
