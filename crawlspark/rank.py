"""Salted priority queue — window-rank scheduling (SURVEY.md §3.5, SPEC.md §3-4).

Selection SEMANTICS are salt-free: per host, top-``B_h`` eligible URLs by
``(priority, crawl_depth, url_hash, url)``. The IMPLEMENTATION is the
mandated two-phase salted window (BASELINE.json:6 "salted priority queue
... window-rank over (host_hash, priority, crawl_depth)"):

- stage 1 partitions by ``(host_hash, salt)`` — the heavy window over the
  full eligible set is split across up to ``max_salts`` partitions per hot
  host, so no single Spark task ever sorts a whole hot host's pending list;
- stage 2 re-ranks the ≤ ``n_salts·B_h`` per-host survivors exactly.

Keeping the FULL per-host budget ``B_h`` in stage 1 (not ``B_h/n_salts``)
is what makes the two-phase result provably equal to the salt-free
definition: each salt partition retains at least as many candidates as the
final per-host cut can use, so no global winner is lost (classic
salted top-K). tests/test_rank.py property-checks salted ≡ unsalted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .config import CrawlConfig

def _rank_order():
    return [
        F.col("priority").asc(),
        F.col("crawl_depth").asc(),
        F.col("url_hash").asc(),
        F.col("url").asc(),
    ]


def host_stats(eligible: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """A1: per-host pending counts → n_salts (hot-host split factor)."""
    return eligible.groupBy("host_hash").agg(
        F.count(F.lit(1)).alias("pending")
    ).withColumn(
        "n_salts",
        F.least(
            F.lit(cfg.max_salts),
            F.greatest(F.lit(1), F.ceil(F.col("pending") / cfg.hot_threshold)),
        ).cast("int"),
    )


def host_budgets(robots_df: DataFrame | None, cfg: CrawlConfig) -> DataFrame | None:
    """Per-host effective budget B_h = max(1, B // crawl_delay_slots)."""
    if robots_df is None:
        return None
    b = cfg.max_fetches_per_host_per_round
    return robots_df.select(
        F.col("host").alias("_b_host"),
        F.greatest(
            F.lit(1), F.floor(F.lit(b) / F.col("crawl_delay_slots"))
        ).cast("int").alias("host_budget"),
        F.col("crawl_delay_slots").alias("delay_slots"),
    )


def select_batch(
    eligible: DataFrame, robots_df: DataFrame | None, cfg: CrawlConfig
) -> DataFrame:
    """Selected rows with columns `rank` (1..B_h) and `delay_slots`.

    eligible: frontier rows with not_before_round <= round (already filtered).
    """
    b_default = cfg.max_fetches_per_host_per_round
    stats = host_stats(eligible, cfg).select("host_hash", "n_salts")
    budgets = host_budgets(robots_df, cfg)

    df = eligible.join(F.broadcast(stats), "host_hash", "left")
    if budgets is not None:
        df = df.join(F.broadcast(budgets), df["host"] == budgets["_b_host"], "left").drop(
            "_b_host"
        )
        df = df.withColumn(
            "host_budget", F.coalesce(F.col("host_budget"), F.lit(b_default))
        ).withColumn("delay_slots", F.coalesce(F.col("delay_slots"), F.lit(1)))
    else:
        df = df.withColumn("host_budget", F.lit(b_default)).withColumn(
            "delay_slots", F.lit(1)
        )

    # F7: salt — engine-only parallelism lever, seed chain (url, 7L)
    df = df.withColumn(
        "salt",
        F.pmod(
            F.xxhash64(F.col("url"), F.lit(cfg.salt_seed).cast("long")),
            F.col("n_salts").cast("long"),
        ).cast("int"),
    )

    # W1 stage 1: heavy window split by salt; keep full host budget per salt
    w1 = Window.partitionBy("host_hash", "salt").orderBy(*_rank_order())
    survivors = df.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= F.col("host_budget")
    )

    # W1 stage 2: exact per-host rank over ≤ n_salts·B_h survivors; W2 cutoff
    w2 = Window.partitionBy("host_hash").orderBy(*_rank_order())
    selected = (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= F.col("host_budget"))
        .drop("_r1", "n_salts", "host_budget", "pending")
    )
    return selected


def cap_round(selected: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """O3: global per-round capacity K in deterministic emission order.

    orderBy+limit executes as TakeOrderedAndProject — no full sort
    materialization; the key (host_hash, rank, url) is total (url unique).
    """
    return selected.orderBy("host_hash", "rank", "url").limit(cfg.round_capacity)


def with_seq(capped: DataFrame) -> DataFrame:
    """Crawl-order sequence numbers 0..n-1 in emission order (S10).

    Single-partition window — bounded by K=round_capacity rows, never the
    frontier (SURVEY.md §3.6 W5 caveat). For unbounded K the seq would be
    derived at read time from the (host_hash, rank, url) sort key instead.
    """
    w = Window.orderBy("host_hash", "rank", "url")
    return capped.withColumn("seq", (F.row_number().over(w) - 1).cast("long"))
