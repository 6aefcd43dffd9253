"""Structured Streaming alternative surface (SURVEY.md §3.9): windowed
metrics over the round snapshots must agree with the batch rollup, and the
streaming dedup must drop in-watermark duplicates."""

import shutil

from pyspark.sql import functions as F

from crawlspark import fixtures
from crawlspark import round as rnd
from crawlspark import streaming
from crawlspark.config import CrawlConfig
from crawlspark.fetch_spec import FetchSpec
from crawlspark.schemas import SEEDS

CKPT = "/tmp/crawlspark-test-stream"


def test_streaming_metrics_match_batch(spark):
    shutil.rmtree(CKPT, ignore_errors=True)
    st = rnd.init_crawl(
        spark,
        spark.createDataFrame([(u,) for u in fixtures.seed_urls()], SEEDS),
        CrawlConfig(),
        FetchSpec(),
        ckpt=CKPT,
    )
    rnd.run_crawl(st, max_rounds=2)

    out = f"{CKPT}/stream-out"
    q = streaming.run_metrics_stream(spark, CKPT, out, f"{CKPT}/stream-ckpt")
    q.awaitTermination(120)

    got = {
        (r["window_start"].second + r["window_start"].minute * 60, r["status"]): (
            r["docs"],
            r["spans"],
        )
        for r in spark.read.parquet(out).collect()
    }
    docs = st.store.read_all("documents", 2)
    want = {
        (r["fetch_round"] * 10 % 3600, r["status"]): (r["docs"], r["spans"])
        for r in docs.groupBy("fetch_round", "status")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum(F.coalesce(F.size("spans"), F.lit(0))).alias("spans"),
        )
        .collect()
    }
    # append mode emits only watermark-CLOSED windows: with a 0s delay,
    # every round except the last is closed — the last window stays open
    # awaiting later data (ST3 semantics). Compare the closed set.
    max_round = max(k[0] for k in want)
    want_closed = {k: v for k, v in want.items() if k[0] < max_round}
    assert got == want_closed
    assert all(k[0] == max_round for k in set(want) - set(want_closed))


def test_streaming_dedup(spark):
    rows = [
        (1, "http://a/1", 10),
        (1, "http://a/1", 10),  # duplicate inside watermark
        (2, "http://a/2", 20),
    ]
    src = spark.createDataFrame(rows, "url_hash long, url string, sec int")

    import tempfile

    d = tempfile.mkdtemp(prefix="cs-stream-dedup")
    src.write.mode("overwrite").parquet(f"{d}/in")
    stream = (
        spark.readStream.schema("url_hash long, url string, sec int")
        .parquet(f"{d}/in")
        .withColumn("event_time", F.timestamp_seconds("sec"))
    )
    deduped = streaming.streaming_url_dedup(stream)
    q = (
        deduped.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{d}/ck")
        .format("parquet")
        .option("path", f"{d}/out")
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["url"] for r in spark.read.parquet(f"{d}/out").collect())
    assert got == ["http://a/1", "http://a/2"]
