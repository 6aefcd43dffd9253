"""Per-partition lineage + fetch/parse metrics (SURVEY.md §3.1 S9, §3.4 A4/A5).

Lineage rows record, for every round and pipeline stage, how many rows each
Spark partition contributed — the per-partition lineage mandated by
BASELINE.json:6. They are computed on already-persisted DataFrames with a
single narrow ``spark_partition_id`` aggregation (no extra shuffle beyond
the tiny count) and appended to the round snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .schemas import LINEAGE


def partition_lineage(df: DataFrame, round_: int, stage: str) -> DataFrame:
    return (
        df.groupBy(F.spark_partition_id().alias("partition_id"))
        .agg(F.count(F.lit(1)).alias("rows"))
        .select(
            F.lit(round_).cast("int").alias("round"),
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            F.col("rows").cast("long"),
        )
    )


def empty_lineage(spark) -> DataFrame:
    return spark.createDataFrame([], LINEAGE)


def scalar_lineage(spark, round_: int, stage: str, rows: int) -> DataFrame:
    """One aggregate lineage row (partition_id = -1) for counters observed
    in-flight via Observation (e.g. the url_quality pre-fetch drop count),
    where per-partition attribution would cost recomputing the dropped
    slice of an already-consumed pass."""
    return spark.createDataFrame([(round_, stage, -1, rows)], LINEAGE)


def fetch_metrics(docs: DataFrame, round_: int) -> DataFrame:
    """A4: per-(round, host, status) fetch/parse metrics in one pass."""
    return (
        docs.select(
            F.lit(round_).alias("round"),
            F.xxhash64(F.parse_url("url", F.lit("HOST"))).alias("host_hash"),
            "status",
            # explicit NULL branch: with ANSI off, size(NULL) is -1, which
            # coalesce would pass through and silently corrupt the sum
            F.when(F.col("spans").isNull(), F.lit(0))
            .otherwise(F.size("spans"))
            .alias("n_spans"),
        )
        .groupBy("round", "host_hash", "status")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_spans").alias("spans"),
            F.sum(
                F.when(F.col("status") == 200, F.lit(1)).otherwise(F.lit(0))
            ).alias("ok_docs"),
        )
    )


def metrics_rollup(metrics: DataFrame) -> DataFrame:
    """A5: (round) / (round,host) / (round,host,status) grouping sets."""
    return metrics.rollup("round", "host_hash", "status").agg(
        F.sum("docs").alias("docs"),
        F.sum("spans").alias("spans"),
        F.sum("ok_docs").alias("ok_docs"),
    )
