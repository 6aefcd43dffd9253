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

def _rank_order(df: "DataFrame | None" = None):
    # `_aged` is the transient aging-adjusted priority (cfg.priority_aging
    # — attached in round.py, never persisted); when present it replaces
    # the base priority in the scheduling order only
    p = "_aged" if df is not None and "_aged" in df.columns else "priority"
    return [
        F.col(p).asc(),
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


def attach_host_budget(
    df: DataFrame, robots_df: DataFrame | None, cfg: CrawlConfig
) -> DataFrame:
    """Attach host_budget/delay_slots columns (J3, run ONCE per row at
    ingest — the scheduler then reads columns, not joins)."""
    b = cfg.max_fetches_per_host_per_round
    budgets = host_budgets(robots_df, cfg)
    if budgets is None:
        return df.withColumn("host_budget", F.lit(b).cast("int")).withColumn(
            "delay_slots", F.lit(1).cast("int")
        )
    out = df.join(F.broadcast(budgets), df["host"] == budgets["_b_host"], "left").drop(
        "_b_host"
    )
    return out.withColumn(
        "host_budget", F.coalesce(F.col("host_budget"), F.lit(b)).cast("int")
    ).withColumn("delay_slots", F.coalesce(F.col("delay_slots"), F.lit(1)).cast("int"))


def apply_adaptive(eligible: DataFrame, host_state: DataFrame | None, cfg: CrawlConfig) -> DataFrame:
    """Attach each host's adaptive multiplier as a TRANSIENT `mult` column
    (host_state = (host_hash, mult), sparse: only mult > 1 rows are stored,
    so the broadcast carries just the misbehaving hosts). The persisted
    base columns host_budget/delay_slots stay untouched — the scheduler
    derives budget_eff = max(1, budget // mult) and the deferral uses
    delay * mult; _frontier_shape drops `mult` so nothing compounds."""
    if host_state is None:
        return eligible.withColumn("mult", F.lit(1))
    j = eligible.join(F.broadcast(host_state), "host_hash", "left")
    return j.withColumn("mult", F.coalesce(F.col("mult"), F.lit(1)))


def adaptive_host_state(
    docs: DataFrame, prev_state: DataFrame | None, cfg: CrawlConfig
) -> DataFrame:
    """Next round's (host_hash, mult) from this round's fetch outcomes:
    >=50% error (4xx/5xx) docs -> mult*2 (capped), zero errors -> mult//2,
    hosts not fetched keep their multiplier; 3xx redirects are NOT errors
    (oracle/simulator.py fetch_stats mirrors the >=400 rule). Only mult > 1
    rows are emitted (sparse)."""
    stats = (
        docs.select(
            F.xxhash64(F.parse_url("url", F.lit("HOST"))).alias("host_hash"),
            "status",
        )
        .groupBy("host_hash")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("status") >= 400, 1).otherwise(0)).alias("err"),
        )
    )
    if prev_state is None:
        joined = stats.withColumn("mult", F.lit(1))
    else:
        joined = stats.join(prev_state, "host_hash", "full_outer").withColumn(
            "mult", F.coalesce(F.col("mult"), F.lit(1))
        )
    new_mult = (
        F.when(F.col("n").isNull(), F.col("mult"))
        .when(
            F.col("err") * 2 >= F.col("n"),
            F.least(F.lit(cfg.adaptive_max_mult), F.col("mult") * 2),
        )
        .when(F.col("err") == 0, F.greatest(F.lit(1), F.floor(F.col("mult") / 2)))
        .otherwise(F.col("mult"))
    )
    return (
        joined.select("host_hash", new_mult.cast("int").alias("mult"))
        .filter(F.col("mult") > 1)
    )


def select_batch(
    eligible: DataFrame, robots_df: DataFrame | None, cfg: CrawlConfig
) -> DataFrame:
    """Selected rows with columns `rank` (1..B_h) and `delay_slots`.

    eligible: frontier rows with not_before_round <= round (already
    filtered), carrying host_budget/delay_slots columns (attach_host_budget
    at ingest); rows without them (unit tests) get config defaults.
    """
    stats = host_stats(eligible, cfg).select("host_hash", "n_salts")
    if "host_budget" not in eligible.columns:
        eligible = attach_host_budget(eligible, robots_df, cfg)
    if "mult" in eligible.columns:
        # adaptive politeness: shrink the effective budget transiently
        eligible = eligible.withColumn(
            "host_budget",
            F.greatest(
                F.lit(1), F.floor(F.col("host_budget") / F.col("mult"))
            ).cast("int"),
        ).drop("mult")
    # shuffle-byte pruning: the two window exchanges move every row twice,
    # and nothing downstream of selection reads host/state/discovered_round/
    # not_before_round (the deferral path reads them from `eligible`, not
    # from the selected batch) — dropping them cuts ~25% of the scheduling
    # shuffle volume. Measured across 2→8 cores this section was the worst
    # scaler (shared memory-bus bound), so bytes ARE the cost.
    eligible = eligible.drop(
        "host", "state", "discovered_round", "not_before_round", "_nb_stored",
        "bucket",  # seen-layout column; nothing downstream of selection reads it
    )
    df = eligible.join(F.broadcast(stats), "host_hash", "left")

    # F7: salt — engine-only parallelism lever, seed chain (url, 7L)
    df = df.withColumn(
        "salt",
        F.pmod(
            F.xxhash64(F.col("url"), F.lit(cfg.salt_seed).cast("long")),
            F.col("n_salts").cast("long"),
        ).cast("int"),
    )

    # W1 stage 1: heavy window split by salt; keep full host budget per salt
    w1 = Window.partitionBy("host_hash", "salt").orderBy(*_rank_order(df))
    survivors = df.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= F.col("host_budget")
    )

    # W1 stage 2: exact per-host rank over ≤ n_salts·B_h survivors; W2 cutoff
    w2 = Window.partitionBy("host_hash").orderBy(*_rank_order(df))
    selected = (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= F.col("host_budget"))
        .drop("_r1", "n_salts", "host_budget", "pending", "_aged")
    )
    return selected


def ip_group_col(n_groups: int) -> "F.Column":
    """Deterministic resolver stub: host_hash → IP group, via the string
    xxhash64 chain so oracle/xxh64.hash_str reproduces it bit-for-bit
    (same construction as cfg.host_boosts host mapping). Production swap
    point: replace with a DNS-resolved (host_hash, ip_group) table join."""
    return F.pmod(
        F.xxhash64(F.concat(F.col("host_hash").cast("string"), F.lit("#ip"))),
        F.lit(int(n_groups)).cast("long"),
    ).cast("int")


def ip_cap(
    selected: DataFrame,
    n_groups: int,
    budget: int,
    keep_group_col: bool = False,
    group_col: "F.Column | None" = None,
) -> DataFrame:
    """Per-IP politeness cap (config.ip_politeness_groups): AFTER the
    per-host budget, each IP group keeps its ``budget`` best rows in
    (rank, host_hash, url) order — best-rank-first across the group's
    hosts, so budget is shared fairly rather than first-host-takes-all;
    the key is total (url unique), deterministic at any parallelism.

    Scale shape: ONE window partitioned by ip_group over already
    host-capped rows — at most (hosts_in_group × B_h) rows per
    partition; `n_groups` is the operator's parallelism lever (size it
    so hosts/N × B_h fits an executor, the same discipline as
    token_shards/pack_sequences shard derivation). Spark compiles the
    rank<=k filter to WindowGroupLimit, so each input partition emits at
    most `budget` rows per group before the exchange.

    ``group_col`` overrides the resolver stub with any host→group
    expression or joined column (the DNS-table production form; the
    driver's ip_cap query passes the md5 cross-engine twin so DuckDB can
    replay the grouping — the xxh64 default is oracle-verified end-to-end
    by tests/test_ip_politeness.py)."""
    g = selected.withColumn(
        "ip_group",
        ip_group_col(n_groups) if group_col is None else group_col,
    )
    w = Window.partitionBy("ip_group").orderBy(
        F.col("rank").asc(), F.col("host_hash").asc(), F.col("url").asc()
    )
    out = g.withColumn("_ipr", F.row_number().over(w)).filter(
        F.col("_ipr") <= F.lit(int(budget))
    ).drop("_ipr")
    return out if keep_group_col else out.drop("ip_group")


EMIT_ORDER = ("host_hash", "rank", "url")


def attach_boosts(
    selected: DataFrame, cfg: CrawlConfig, boosts_df: DataFrame | None = None
) -> DataFrame:
    """Opt-in host-priority boosts: attach a transient `boost` column via
    one broadcast join keyed on host_hash. Unlisted hosts get boost 0.
    No-op (no column, identical plan) when the feature is off, so the
    default crawl stays bit-equal.

    Two boost sources, identical join and transient-column semantics:
    - ``cfg.host_boosts`` tuple (e.g. linkgraph.pagerank_boosts) — the
      driver-side policy hand-off for host sets ≲10^6; xxh64.hash_str ≡
      Spark xxhash64 maps the config's host names driver-side.
    - ``boosts_df`` — a relational (host_hash:long, boost:int) frame
      (e.g. linkgraph.pagerank_boosts_df, linkgraph.trust_boosts_df —
      the anti-spam composition that clamps high-spam-mass hosts behind
      every organic tier — or any stored table) that never touches the
      driver; the 10^8+-host path. Takes precedence over the tuple when
      both are set. tests/test_host_boosts.py asserts the two sources
      are crawl-order digest-equal for the same tiers and that the trust
      clamp actually demotes a planted link farm in crawl order."""
    if boosts_df is None and not cfg.host_boosts:
        return selected
    if boosts_df is None:
        from .xxh64 import hash_str

        spark = selected.sparkSession
        rows = [(hash_str(h), int(b)) for h, b in cfg.host_boosts]
        boosts_df = spark.createDataFrame(rows, "host_hash long, boost int")
    else:
        boosts_df = boosts_df.select(
            F.col("host_hash").cast("long").alias("host_hash"),
            F.col("boost").cast("int").alias("boost"),
        )
    return selected.join(F.broadcast(boosts_df), "host_hash", "left").withColumn(
        "boost", F.coalesce(F.col("boost"), F.lit(0)).cast("int")
    )


def _emit_order(df: DataFrame):
    """Emission sort key: (boost?, host_hash, rank, url) — the transient
    boost column leads when host boosts are attached; the tail key is
    total (url unique), so the order is deterministic either way."""
    cols = (("boost",) if "boost" in df.columns else ()) + EMIT_ORDER
    return [F.col(c) for c in cols]


def cap_round(selected: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """O3: global per-round capacity K in deterministic emission order.

    orderBy+limit executes as TakeOrderedAndProject — no full sort
    materialization; the key (boost?, host_hash, rank, url) is total (url
    unique). A None capacity disables the cap (and its extra stage)
    entirely.
    """
    if cfg.round_capacity is None:
        return selected
    return selected.orderBy(*_emit_order(selected)).limit(cfg.round_capacity)


def with_seq(capped: DataFrame, scalable: bool | None = None) -> DataFrame:
    """Crawl-order sequence numbers 0..n-1 in emission order (S10).

    Two implementations with IDENTICAL output (tests/test_rank.py checks):

    - window: `row_number` over a global-order window — one partition, fine
      for capped rounds (≤ K rows; SURVEY.md §3.6 W5 caveat);
    - scalable (default for uncapped rounds): range-partition on the
      emission key, sort within partitions, then seq = partition offset +
      local index — offsets come from one tiny per-partition count collect,
      the heavy sort stays fully parallel. Range-bound sampling only moves
      partition boundaries, never the total order, so output is
      deterministic regardless of sampling.
    """
    if scalable is None:
        scalable = False
    order = _emit_order(capped)
    if not scalable:
        w = Window.orderBy(*order)
        return capped.withColumn("seq", (F.row_number().over(w) - 1).cast("long"))

    from pyspark.storagelevel import StorageLevel

    part = (
        capped.repartitionByRange(
            max(capped.sparkSession.sparkContext.defaultParallelism, 2),
            *order,
        )
        .sortWithinPartitions(*order)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )  # persisted so partition ids are identical in the sizes job and the
    # assign job; caller unpersists via the _cs_cached attribute
    sizes = {
        r["pid"]: r["n"]
        for r in part.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(part.schema.fields + [StructField("seq", LongType(), False)])

    def assign(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = offsets.get(pid, 0)
        for pdf in it:
            pdf = pdf.copy()
            pdf["seq"] = range(base, base + len(pdf))
            base += len(pdf)
            yield pdf

    res = part.mapInPandas(assign, out_schema)
    res._cs_cached = part
    return res
