"""Structured Streaming surface (SURVEY.md §3.9) — the continuous-loop
alternative to the batch round driver.

Heroshi runs as a continuous fetch loop (recalled, SURVEY.md §0); the graft
spec makes each round one DataFrame job, so the batch round loop in
round.py is the PRIMARY architecture (deterministic, exact-resume). This
module provides the Structured Streaming equivalents the spec inventory
requires, wired to the same snapshot layout:

- ST1 round/tumbling window: the per-round document dirs form a file
  stream; `fetch_round` maps to a logical event time, windowed aggs roll
  fetch metrics continuously.
- ST2 stateful seen set: `dropDuplicatesWithinWatermark` on `url_hash`
  gives the watermark-bounded dedup, and `SeenSetProcessor` (below) is the
  full custom stateful operator via transformWithStateInPandas, keyed by
  bucket. NOTE: running TWS needs the `protobuf` python package (Spark's
  state-server protocol) — absent in this container, so its test is
  import-gated; the batch engine's per-bucket Bloom blobs are the same
  state in batch form.
- ST3 late data: links that arrive for already-fetched URLs simply lose the
  dedup race — the watermark bounds how long state is retained.
- ST4 exactly-once resume: checkpointLocation + the idempotent parquet
  sink; the batch engine's manifest-committed round snapshots are the
  equivalent.

Everything here is exercised with Trigger.AvailableNow in
tests/test_streaming.py so it runs (and terminates) in CI.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schemas import DOCUMENTS


def documents_stream(spark: SparkSession, ckpt_root: str) -> DataFrame:
    """File-source stream over the per-round document snapshots (S6 as a
    stream): new round dirs appear ⇒ new micro-batch."""
    return (
        spark.readStream.schema(DOCUMENTS)
        .option("pathGlobFilter", "*.parquet")
        .parquet(f"{ckpt_root}/round=*/documents")
    )


def with_event_time(docs: DataFrame, seconds_per_round: int = 10) -> DataFrame:
    """Logical event time from the round number (rounds are the only clock —
    SURVEY.md §2 determinism rule; the epoch anchor is arbitrary but fixed)."""
    return docs.withColumn(
        "event_time",
        F.timestamp_seconds(F.col("fetch_round").cast("long") * seconds_per_round),
    )


def streaming_fetch_metrics(
    docs: DataFrame, seconds_per_round: int = 10, late: str = "30 seconds"
) -> DataFrame:
    """ST1+ST3: watermarked tumbling-window fetch metrics per status."""
    w = with_event_time(docs, seconds_per_round).withWatermark("event_time", late)
    return w.groupBy(
        F.window("event_time", f"{seconds_per_round} seconds").alias("round_window"),
        "status",
    ).agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(
            F.when(F.col("spans").isNull(), F.lit(0)).otherwise(F.size("spans"))
        ).alias("spans"),
    ).select(
        F.col("round_window.start").alias("window_start"),
        "status",
        "docs",
        "spans",
    )


def streaming_url_dedup(
    links: DataFrame, seconds_per_round: int = 10, late: str = "30 seconds"
) -> DataFrame:
    """ST2: streaming in-flight URL dedup on url_hash within the watermark
    (the streaming analog of A2 + the seen anti-join's in-round tier)."""
    return (
        links.withWatermark("event_time", late)
        .dropDuplicatesWithinWatermark(["url_hash"])
    )


from pyspark.sql.streaming.stateful_processor import StatefulProcessor


class SeenSetProcessor(StatefulProcessor):
    """ST2 custom stateful operator: per-bucket URL-seen membership held in
    transformWithStateInPandas state — the long-running-job form of the
    batch engine's per-bucket Bloom + exact-table tier. Keyed by ``bucket``;
    state = the bucket's exact set of url_hashes (ListState); emits only
    first-seen rows. Requires the RocksDB state-store provider
    (spark.sql.streaming.stateStore.providerClass)."""

    def init(self, handle) -> None:
        from pyspark.sql.types import LongType, StructField, StructType

        self._hashes = handle.getListState(
            "hashes", StructType([StructField("h", LongType())])
        )

    def handleInputRows(self, key, rows, timerValues):
        import pandas as pd

        seen = {r[0] for r in self._hashes.get()}
        out_hash, out_url = [], []
        added = []
        for pdf in rows:
            for h, u in zip(pdf["url_hash"], pdf["url"]):
                h = int(h)
                if h in seen:
                    continue
                seen.add(h)
                added.append((h,))
                out_hash.append(h)
                out_url.append(u)
        if added:
            self._hashes.appendList(added)
        yield pd.DataFrame({"url_hash": out_hash, "url": out_url})

    def close(self) -> None:
        pass


def stateful_seen_stream(links: DataFrame) -> DataFrame:
    """Streaming URL-seen dedup via transformWithStateInPandas (Spark 4.x),
    keyed by bucket (SURVEY.md §3.9 ST2). Input needs url_hash/url/bucket."""
    return links.groupBy("bucket").transformWithStateInPandas(
        statefulProcessor=SeenSetProcessor(),
        outputStructType="url_hash long, url string",
        outputMode="append",
        timeMode="none",
    )


def stateful_seen_stream_legacy(links: DataFrame) -> DataFrame:
    """ST2 via applyInPandasWithState (the Spark 3.x-era API — runs in this
    container, unlike transformWithStateInPandas which needs protobuf):
    per-bucket GroupState holds the bucket's url_hash set; only first-seen
    rows are emitted. Semantics identical to SeenSetProcessor."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    def dedup(key, pdfs, state):
        import pandas as pd

        seen = set(state.get[0]) if state.exists else set()
        out_h, out_u = [], []
        for pdf in pdfs:
            for h, u in zip(pdf["url_hash"], pdf["url"]):
                h = int(h)
                if h in seen:
                    continue
                seen.add(h)
                out_h.append(h)
                out_u.append(u)
        state.update((list(seen),))
        yield pd.DataFrame({"url_hash": out_h, "url": out_u})

    return links.groupBy("bucket").applyInPandasWithState(
        dedup,
        outputStructType="url_hash long, url string",
        stateStructType="hashes array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_metrics_stream(
    spark: SparkSession,
    ckpt_root: str,
    out_dir: str,
    checkpoint_dir: str,
    late: str = "0 seconds",
):
    """Materialize the windowed metrics with Trigger.AvailableNow (drains
    whatever rounds exist, then stops — ST4 resume comes from the stream
    checkpoint). Append mode emits a round's window only once the
    watermark passes it — the LAST round's window stays open until a later
    round arrives (exactly the late-data semantics of ST3)."""
    docs = documents_stream(spark, ckpt_root)
    agg = streaming_fetch_metrics(docs, late=late)
    return (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .format("parquet")
        .option("path", out_dir)
        .start()
    )


def streaming_doc_dedup(
    docs: DataFrame, late: str = "30 seconds"
) -> DataFrame:
    """Streaming exact-text dedup over the document stream — the
    incremental form of textops.exact_dedup for an always-on ingestion
    pipeline: each doc's text hash is deduplicated within the watermark,
    so only the FIRST copy of any text flows downstream. State is bounded
    by the watermark horizon (dropDuplicatesWithinWatermark evicts expired
    keys); the batch exact_dedup remains the full-corpus authority.
    Requires an ``event_time`` column (with_event_time)."""
    return (
        docs.withColumn("text_hash", F.md5("text"))
        .withWatermark("event_time", late)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )
