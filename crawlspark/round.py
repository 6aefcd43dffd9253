"""Crawl-round orchestration — each round is ONE DataFrame job chain
(BASELINE.json:6; dataflow of SURVEY.md §4.1, semantics of SPEC.md).

Rounds are logical integers; round r consumes the round r-1 snapshot and
writes the round r snapshot (frontier / seen_delta / bloom / crawl_order /
documents / lineage) through the SnapshotStore seam, then commits the round
in the manifest — which is what makes resume exact: `resume()` re-enters
the loop from the last committed round with zero driver-side pickled state
(the Bloom registry is rebuilt from its snapshot rows).

Scale notes (the 10^10 design point):
- per-round work is O(round batch), not O(frontier): the heavy inputs are
  the eligible slice (pruned by `not_before_round` at scan) and the
  candidate links; the seen set is only touched by the Bloom-prefiltered
  anti-join and an O(new) append;
- the frontier rewrite is the one O(frontier) IO in the parquet-snapshot
  engine; the Iceberg engine expresses it as a row-level MERGE (O(batch)
  row churn) behind the same SnapshotStore API (io_tables.py docstring);
- every dim join (robots, host budgets, host stats, fetch-batch parents) is
  an explicit broadcast; the only all-data shuffles per round are the two
  scheduling windows (salted) and the candidate dedup/anti-join, all keyed
  to spread by design (salt, url_hash);
- row counts piggyback on the snapshot writes via the Observation API —
  a round is 7 Spark actions total (3 observed writes, the fetch write,
  the bloom-partial collect, lineage + metrics writes), independent of
  data volume.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F
from pyspark.storagelevel import StorageLevel

from . import candidates as cand_mod
from . import fetch as fetch_mod
from . import ingest, metrics, rank, seen as seen_mod
from .bloom import BloomRegistry, bloom_params
from .config import CrawlConfig
from .fetch_spec import DEFAULT_SPEC, FetchSpec
from .io_tables import SnapshotStore
from .robots import robots_table_df
from .schemas import CRAWL_ORDER, FRONTIER, SEEN_BLOOM


@dataclass
class CrawlState:
    spark: SparkSession
    store: SnapshotStore
    cfg: CrawlConfig
    spec: FetchSpec
    robots_df: DataFrame | None
    registry: BloomRegistry | None  # None in bloom_mode='relational'
    next_round: int
    robots_rules_bcast: object | None = None
    # sliced Bloom broadcast chain: one consolidated base + per-round deltas
    # carrying ONLY the buckets that changed that round (item: 10^10 scale =
    # ~1.2 GB payload; re-shipping it whole every round is the scale-killer)
    bloom_base_bcast: object | None = None
    bloom_delta_bcasts: list = None  # type: ignore[assignment]
    last_bloom_delta_buckets: int | None = None  # None = full rebroadcast
    # relational bloom mode: cached {bucket: (m,k)} of the latest base —
    # P rows of ints (metadata only, never blobs); refreshed on compaction
    bloom_params_cache: dict | None = None
    # relational host-boost source (host_hash, boost), e.g.
    # linkgraph.pagerank_boosts_df — the 10^8+-host alternative to the
    # cfg.host_boosts tuple; broadcast-joined by rank.attach_boosts each
    # round, takes precedence over the tuple when both are set
    boosts_df: DataFrame | None = None

    def __post_init__(self):
        if self.bloom_delta_bcasts is None:
            self.bloom_delta_bcasts = []

    def bloom_delta_params(self) -> dict:
        """(m,k) per bucket for building THIS round's delta blobs — read
        from the latest base's metadata columns (blob column pruned away),
        so deltas keep matching a grown bucket's larger filter."""
        if self.bloom_params_cache is None:
            bases = self.store.bloom_bases()
            params: dict = {}
            if bases:
                rows = (
                    self.store.read(max(bases), "bloom")
                    .select("bucket", "m_bits", "k_hashes")
                    .collect()
                )
                params = {
                    int(r["bucket"]): (int(r["m_bits"]), int(r["k_hashes"]))
                    for r in rows
                }
            self.bloom_params_cache = params
        return self.bloom_params_cache

    # resolved robots mode (cfg.robots_relational OR auto-selected by
    # rule-bearing-host count at init/resume — config.py threshold note)
    robots_relational: bool = False
    # host-universe size (len of the robots host table at init/resume);
    # bounds the selected batch a priori (≤ n_hosts × B) for the with_seq
    # engine choice (cfg.seq_window_max_rows). None = unknown ⇒ scalable.
    n_hosts: int | None = None

    def rules_bcast(self):
        if self.robots_relational:
            return None  # robots applied relationally; no python dict exists
        if self.robots_rules_bcast is None and self.robots_df is not None:
            self.robots_rules_bcast = self.spark.sparkContext.broadcast(
                cand_mod.robots_rules_map(self.robots_df)
            )
        return self.robots_rules_bcast

    def bloom_broadcasts(self) -> list | None:
        """The probe chain (base + deltas); lazily consolidates on first use
        (fresh resume has only the registry)."""
        if not self.cfg.use_bloom_prefilter:
            return None
        if self.bloom_base_bcast is None:
            self.bloom_base_bcast = self.spark.sparkContext.broadcast(
                self.registry.broadcast_payload()
            )
            self.bloom_delta_bcasts = []
        return [self.bloom_base_bcast, *self.bloom_delta_bcasts]


def _set_crawl_session_confs(spark: SparkSession) -> None:
    """Planner settings the crawl engine relies on (runtime-settable, so
    the frozen bench/CLI builders need no change). Subset co-partitioning:
    candidate_rows keys its one exchange on `bucket` and the seen
    anti-join on (bucket, url_hash) — hash(bucket) satisfies that
    clustering only when this flag is off (Spark's 3.3+ default guards
    against skewed subset keys; bucket = url_hash mod P is uniform by
    construction, so the guard costs a full extra candidate shuffle per
    round here and protects nothing)."""
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")


def _frontier_shape(df: DataFrame) -> DataFrame:
    return df.select(*[f.name for f in FRONTIER.fields])


def resolve_bloom_relational(cfg: CrawlConfig) -> bool:
    """bloom_mode='auto' resolves by the PROJECTED broadcast payload —
    n_buckets × (m_bits/8), exact from (capacity, fpp, P) — against
    cfg.bloom_broadcast_max_bytes. Beyond it, repeatedly (re)shipping the
    payload and holding the registry on the driver stops being sane, so
    the executor-side relational state engages without a config change."""
    if cfg.bloom_mode == "relational":
        return True
    if cfg.bloom_mode == "broadcast":
        return False
    m, _ = bloom_params(cfg.bloom_capacity_per_bucket, cfg.bloom_fpp)
    return cfg.n_buckets * (m // 8) > cfg.bloom_broadcast_max_bytes


def resolve_frontier_delta(cfg: CrawlConfig, store: SnapshotStore, r: int) -> bool:
    """Per-round frontier-engine choice. 'auto' (default) selects by the
    running frontier counter the manifest already carries: below
    cfg.frontier_delta_min_rows the stored engine's single full rewrite is
    cheaper than the delta chain's fixed per-round read cost (measured:
    stored ~1.65k vs delta ~1.44-1.54k URLs/s at sf0.1, 69.3k vs
    57.7-65.7k at the 1M-host tier — BENCH/BASELINE.md round 3); above it
    the O(batch) delta IO is the only sane choice (a 10^10-row frontier
    cannot be rewritten whole every round). A stored auto round records a
    frontier base, so the two round kinds interleave freely on one
    checkpoint — digest-equality across switches in both directions is
    tested (test_frontier_delta).

    A missing counter (legacy checkpoint) resolves to stored: the stored
    round needs no counter and its Observation write re-seeds one, so auto
    self-heals instead of failing."""
    if cfg.frontier_delta is True:
        return True
    if not cfg.frontier_delta:
        return False
    info = store.read_manifest().get("round_info", {}).get(str(r - 1), {})
    n = info.get("frontier")
    return n is not None and int(n) >= cfg.frontier_delta_min_rows


def resolve_recrawl_delta(cfg: CrawlConfig, store: SnapshotStore, r: int) -> bool:
    """Per-round recrawl_state-engine choice, the resolve_frontier_delta
    discipline applied to the refresh-state table (VERDICT r6 #4): 'auto'
    (default) selects by the tracked-row counter the manifest carries
    (round_info[r-1].recrawl_rows) — below cfg.recrawl_delta_min_rows the
    stored engine's one columnar rewrite beats the delta chain's
    merge-on-read resolve; above it only the O(touched) delta may be
    written (a 10^10-row state table cannot be rewritten whole per
    round). A stored round records a recrawl base, so round kinds
    interleave freely on one checkpoint; a missing counter (legacy
    checkpoint) resolves to stored, whose write re-seeds the counter —
    auto self-heals instead of failing."""
    if cfg.recrawl_delta is True:
        return True
    if not cfg.recrawl_delta:
        return False
    info = store.read_manifest().get("round_info", {}).get(str(r - 1), {})
    n = info.get("recrawl_rows")
    return n is not None and int(n) >= cfg.recrawl_delta_min_rows


def _resolve_robots_mode(
    cfg: CrawlConfig, robots_df: DataFrame | None, n_hosts: int | None = None
) -> bool:
    """Auto-select the robots mode by rule-bearing host count: the dict
    broadcast is a pickled python closure — fine to ~10^5-10^6 hosts, a
    driver chokepoint beyond. When the caller already knows the TOTAL host
    count (it built robots_df from a driver-side list) and it is at or
    below the threshold, the rule-bearing count can't exceed it — skip the
    Spark action entirely (it was the single largest init_crawl cold-start
    cost at small tiers). The count only runs for large host tables, where
    it is one cheap dim aggregate."""
    if cfg.robots_relational:
        return True
    if robots_df is None:
        return False
    if n_hosts is not None and n_hosts <= cfg.robots_relational_threshold:
        return False
    n = robots_df.filter(
        (F.size("allow_prefixes") > 0) | (F.size("disallow_prefixes") > 0)
    ).count()
    return n > cfg.robots_relational_threshold


def _default_hosts(spec: FetchSpec) -> list[str]:
    return [f"h{k}.example" for k in range(spec.n_hosts)]


def init_crawl(
    spark: SparkSession,
    seeds_df: DataFrame,
    cfg: CrawlConfig = CrawlConfig(),
    spec: FetchSpec = DEFAULT_SPEC,
    ckpt: str = "/tmp/crawlspark-ckpt",
    robots_hosts: list[str] | None = None,
    sitemaps_df: DataFrame | None = None,
) -> CrawlState:
    """Round-0 state: canonicalized+filtered seeds become frontier and seen.

    ``sitemaps_df`` (opt-in, same discipline as cfg.host_boosts): a
    (host, xml) sitemap table whose parsed <loc> entries join the seed
    set with sitemap-priority-derived crawl priority (sitemaps.
    sitemap_seed_candidates); they then ride the identical canonicalize →
    robots → A2-dedup path as explicit seeds, so ordering/seen equality
    vs the oracle holds with the feature on, and omitting it keeps the
    crawl bit-equal to the sitemap-free oracle."""
    cfg.validate()
    _set_crawl_session_confs(spark)
    store = SnapshotStore(spark, ckpt)
    _hosts = robots_hosts or _default_hosts(spec)
    robots_df = robots_table_df(spark, _hosts)

    seeds = seeds_df.select("url").withColumn("priority", F.lit(0)).withColumn(
        "crawl_depth", F.lit(0)
    )
    if sitemaps_df is not None:
        from . import sitemaps as _sitemaps

        seeds = seeds.unionByName(_sitemaps.sitemap_seed_candidates(sitemaps_df))
    prepped = ingest.prepare_urls(seeds, cfg, robots_df)
    deduped = rank.attach_host_budget(
        ingest.dedup_candidates(prepped), robots_df, cfg
    ).persist(StorageLevel.MEMORY_AND_DISK)
    frontier0 = _frontier_shape(
        deduped.withColumn("discovered_round", F.lit(0))
        .withColumn("not_before_round", F.lit(0))
        .withColumn("state", F.lit("pending"))
    )
    obs_f0 = Observation()
    store.write(
        frontier0.observe(obs_f0, F.count(F.lit(1)).alias("n")), 0, "frontier"
    )
    n_frontier0 = int(obs_f0.get["n"])
    if cfg.frontier_delta:
        store.record_frontier_base(0)
    store.write(deduped.select("url_hash", "url", "bucket"), 0, "seen_delta")

    if resolve_bloom_relational(cfg):
        registry = None
        _write_bloom_base_relational(store, deduped, 0, cfg)
    else:
        registry = BloomRegistry(fpp=cfg.bloom_fpp, initial_capacity=cfg.bloom_capacity_per_bucket)
        _absorb_new_into_registry(deduped, registry, store, 0, cfg)
        _write_bloom(spark, store, registry, 0)
    if cfg.host_page_quota:
        # seeds are exempt from the quota but count toward usage
        store.write(
            deduped.groupBy("host_hash").agg(
                F.count(F.lit(1)).cast("long").alias("n")
            ),
            0,
            "host_counts",
        )
    deduped.unpersist()
    store.commit_round(0, {"stage": "init", "frontier": n_frontier0})
    return CrawlState(
        spark, store, cfg, spec, robots_df, registry, next_round=1,
        robots_relational=_resolve_robots_mode(cfg, robots_df, len(_hosts)),
        n_hosts=len(_hosts),
    )


def resume(
    spark: SparkSession,
    ckpt: str,
    cfg: CrawlConfig = CrawlConfig(),
    spec: FetchSpec = DEFAULT_SPEC,
    robots_hosts: list[str] | None = None,
) -> CrawlState:
    """Exact restart from the last committed round (SURVEY.md §4.2)."""
    cfg.validate()
    _set_crawl_session_confs(spark)
    store = SnapshotStore(spark, ckpt)
    last = store.last_complete_round()
    if last is None:
        raise ValueError(f"no committed rounds under {ckpt}")
    if cfg.frontier_delta:
        # Resuming a plain-engine checkpoint with the delta engine: the last
        # round has a full frontier but no recorded base, so the FIRST delta
        # round would write only removals/additions and the round after that
        # would find neither a base nor a full frontier — a crash deferred
        # until after a delta round committed. Record the base NOW (the full
        # frontier already on disk), or fail fast if there is none.
        bases = [b for b in store.frontier_bases() if b <= last]
        if not bases:
            if not store.exists(last, "frontier"):
                raise ValueError(
                    f"cannot resume with frontier_delta: round {last} has "
                    "neither a full frontier nor a recorded frontier base"
                )
            store.record_frontier_base(last)
        info = store.read_manifest().get("round_info", {}).get(str(last), {})
        if "frontier" not in info and cfg.frontier_delta is True:
            # 'auto' tolerates this: a counter-less checkpoint resolves to a
            # stored round, whose Observation write re-seeds the counter
            raise ValueError(
                f"cannot resume with frontier_delta: round {last} committed "
                "without a frontier counter (checkpoint predates the delta "
                "engine) — resume with the stored engine first"
            )
    _hosts = robots_hosts or _default_hosts(spec)
    robots_df = robots_table_df(spark, _hosts)
    if resolve_bloom_relational(cfg):
        # Bloom state IS the parquet rows — nothing driver-resident to
        # rebuild. If the checkpoint has no recorded base (it was created in
        # broadcast mode), one must be built from the exact seen table NOW:
        # otherwise pre-resume keys would probe "definitely new" and bypass
        # the exact anti-join — a correctness hole, not a perf knob.
        if not [b for b in store.bloom_bases() if b <= last]:
            seen_all = store.read_seen(last)
            if seen_all is not None:
                _write_bloom_base_relational(store, seen_all, last, cfg)
        return CrawlState(
            spark, store, cfg, spec, robots_df, None, next_round=last + 1,
            robots_relational=_resolve_robots_mode(cfg, robots_df, len(_hosts)),
            n_hosts=len(_hosts),
        )
    if store.exists(last, "bloom"):
        bloom_rows = store.read(last, "bloom").collect()
    else:
        # Mode-switch resume (relational checkpoint → broadcast engine):
        # relational mode persists bloom rows only at BASE rounds, so the
        # last round usually has none — without this the resume died in an
        # opaque parquet path-not-found. Rebuild full base rows DISTRIBUTED
        # from the exact seen table (driver sees only per-bucket counts and
        # ≤P blob rows) and adopt them — the symmetric analog of the
        # broadcast→relational direction above. FP behavior may differ
        # from an unbroken broadcast run (growth history restarts), which
        # is harmless: the exact anti-join tier downstream absorbs FPs.
        seen_all = store.read_seen(last)
        if seen_all is None:
            raise ValueError(
                f"cannot resume round {last} in bloom_mode='broadcast': "
                "no bloom snapshot at that round and no seen rows to "
                "rebuild one from"
            )
        counts = {
            int(r["bucket"]): int(r["n"])
            for r in seen_all.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        caps = {
            b: seen_mod.sized_capacity(cfg.bloom_capacity_per_bucket, n)
            for b, n in counts.items()
        }
        bloom_rows = seen_mod.build_bloom_base(
            seen_all, caps, cfg.bloom_fpp, cfg.bloom_capacity_per_bucket
        ).collect()
    registry = BloomRegistry.from_rows(
        [
            (r["bucket"], r["blob"], r["m_bits"], r["k_hashes"], r["n_items"], r["capacity"])
            for r in bloom_rows
        ],
        fpp=cfg.bloom_fpp,
        initial_capacity=cfg.bloom_capacity_per_bucket,
    )
    return CrawlState(
        spark, store, cfg, spec, robots_df, registry, next_round=last + 1,
        robots_relational=_resolve_robots_mode(cfg, robots_df, len(_hosts)),
        n_hosts=len(_hosts),
    )


def _absorb_new_into_registry(
    new_rows: DataFrame,
    registry: BloomRegistry,
    store: SnapshotStore,
    round_: int,
    cfg: CrawlConfig,
) -> tuple[dict, bool]:
    """Fold the round's new hashes into the Bloom registry (U-4/A3):
    distributed per-bucket partial blobs (one collect of ≤P small rows),
    driver-side OR; a bucket that would overflow its capacity is rebuilt
    from the exact seen table at ≥2× capacity (rare, amortized O(1)/key).

    Returns (delta_payload, grew): the per-bucket partial blobs of THIS
    round's new hashes — exactly what the sliced broadcast ships — and
    whether any bucket was rebuilt (rebuilds change (m,k), which invalidates
    chain probing for that bucket, so the caller re-consolidates)."""
    params = {b: (f.m, f.k) for b, f in registry.filters.items()}
    default_params = bloom_params(cfg.bloom_capacity_per_bucket, cfg.bloom_fpp)
    partials = seen_mod.partial_bloom_blobs(new_rows, params, default_params).collect()
    if not partials:
        return {}, False
    counts = {int(r["bucket"]): int(r["n_items"]) for r in partials}
    grow = set(registry.buckets_needing_growth(counts))
    delta = {}
    for row in partials:
        b = int(row["bucket"])
        if b in grow:
            continue
        registry.get(b).absorb_blob(bytes(row["blob"]), int(row["n_items"]))
        delta[b] = (int(row["m_bits"]), int(row["k_hashes"]), bytes(row["blob"]))
    if grow:
        # Distributed rebuild: the driver only SIZES the new filter (counts
        # via a |grow|-row agg); the blob itself is built by the same
        # partial_bloom_blobs machinery at the new (m,k) over the exact seen
        # table — |grow| small blob rows cross the driver, never the hashes.
        grow_seen = store.read_seen(round_).filter(
            F.col("bucket").isin(*[int(b) for b in grow])
        ).select("bucket", "url_hash")
        totals = {
            int(r["bucket"]): int(r["n"])
            for r in grow_seen.groupBy("bucket").agg(
                F.count(F.lit(1)).alias("n")
            ).collect()
        }
        new_caps = {b: registry.grown_capacity(int(b), totals[int(b)]) for b in grow}
        new_params = {int(b): bloom_params(new_caps[b], cfg.bloom_fpp) for b in grow}
        rebuilt = seen_mod.partial_bloom_blobs(
            grow_seen, new_params, default_params
        ).collect()
        for row in rebuilt:
            b = int(row["bucket"])
            registry.install(
                b, bytes(row["blob"]), int(row["m_bits"]), int(row["k_hashes"]),
                int(row["n_items"]), new_caps[b],
            )
    return delta, bool(grow)


def _refresh_bloom_broadcast(st: CrawlState, delta: dict, grew: bool) -> None:
    """Ship only what changed: append a delta broadcast of this round's
    changed buckets, or re-consolidate to one full broadcast when a bucket
    was rebuilt / the chain reached cfg.bloom_rebroadcast_every links
    (LSM-style compaction of broadcasts). Superseded broadcasts are
    unpersisted."""
    if not st.cfg.use_bloom_prefilter:
        return
    sc = st.spark.sparkContext
    chain_full = len(st.bloom_delta_bcasts) + 1 >= st.cfg.bloom_rebroadcast_every
    if grew or chain_full or st.bloom_base_bcast is None:
        for b in [st.bloom_base_bcast, *st.bloom_delta_bcasts]:
            if b is not None:
                b.unpersist()
        st.bloom_base_bcast = sc.broadcast(st.registry.broadcast_payload())
        st.bloom_delta_bcasts = []
        st.last_bloom_delta_buckets = None
    elif delta:
        st.bloom_delta_bcasts.append(sc.broadcast(delta))
        st.last_bloom_delta_buckets = len(delta)
    else:
        st.last_bloom_delta_buckets = 0


def _write_bloom(spark, store, registry: BloomRegistry, round_: int) -> None:
    # pandas → Arrow ingestion: the registry snapshot is ~P × m/8 bytes of
    # blobs every round (5 MB at the test tier, far more at scale) and the
    # Arrow path moves it driver→JVM columnar instead of pickled row
    # tuples (measured ~0.32 s → ~0.20 s per write at P=64)
    import pandas as pd

    pdf = pd.DataFrame(
        registry.to_rows(), columns=[f.name for f in SEEN_BLOOM.fields]
    )
    store.write(spark.createDataFrame(pdf, SEEN_BLOOM), round_, "bloom")


def _write_bloom_base_relational(
    store: SnapshotStore, rows: DataFrame, round_: int, cfg: CrawlConfig
) -> None:
    """Relational-mode base: size each bucket from a ≤P-row count aggregate
    (driver sees only ints), build the blobs distributed, record the base."""
    counts = {
        int(r["bucket"]): int(r["n"])
        for r in rows.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    caps = {
        b: seen_mod.sized_capacity(cfg.bloom_capacity_per_bucket, n)
        for b, n in counts.items()
    }
    base = seen_mod.build_bloom_base(
        rows, caps, cfg.bloom_fpp, cfg.bloom_capacity_per_bucket
    )
    store.write(base, round_, "bloom")
    store.record_bloom_base(round_)


def _compact_bloom(st: CrawlState, r: int) -> None:
    """Relational-mode chain compaction (the executor-side analog of the
    broadcast chain's re-consolidation): per bucket, OR-merge the chain rows
    when (m,k) agree and the key count still fits capacity; otherwise
    rebuild the bucket from the exact seen table at grown capacity. All blob
    work runs in per-bucket tasks — the driver only routes bucket ids from a
    ≤P-row metadata aggregate."""
    store, cfg = st.store, st.cfg
    chain = store.read_bloom_chain(r)
    if chain is None:
        return
    meta = (
        chain.groupBy("bucket")
        .agg(
            F.countDistinct("m_bits", "k_hashes").alias("n_params"),
            F.sum("n_items").alias("n_total"),
            F.max("capacity").alias("capacity"),  # base row's (deltas NULL)
        )
        .collect()
    )
    merge_caps: dict[int, int] = {}
    rebuild_caps: dict[int, int] = {}
    for row in meta:
        b = int(row["bucket"])
        n_total = int(row["n_total"])
        cap = int(row["capacity"]) if row["capacity"] is not None else (
            cfg.bloom_capacity_per_bucket
        )
        if int(row["n_params"]) == 1 and n_total <= cap:
            merge_caps[b] = cap
        else:
            rebuild_caps[b] = max(
                cfg.bloom_capacity_per_bucket, 2 * max(n_total, cap)
            )
    parts = []
    if merge_caps:
        parts.append(
            seen_mod.merge_bloom_chain(
                chain.filter(F.col("bucket").isin(*merge_caps)), merge_caps
            )
        )
    if rebuild_caps:
        seen_rows = st.store.read_seen(r).filter(
            F.col("bucket").isin(*rebuild_caps)
        )
        parts.append(
            seen_mod.build_bloom_base(
                seen_rows, rebuild_caps, cfg.bloom_fpp, cfg.bloom_capacity_per_bucket
            )
        )
    if not parts:
        return
    base = parts[0]
    for p in parts[1:]:
        base = base.unionByName(p)
    store.write(base, r, "bloom")
    store.record_bloom_base(r)
    st.bloom_params_cache = None  # grown buckets may have new (m,k)


def crawl_round(st: CrawlState, r: int) -> dict:
    """Execute round r per SPEC.md; returns counters for the caller/bench."""
    import os
    import time

    _timing = os.environ.get("CRAWLSPARK_TIMING") == "1"
    _t = {"_last": time.perf_counter()}

    def _tick(name: str) -> None:
        if _timing:
            now = time.perf_counter()
            _t[name] = round(now - _t["_last"], 2)
            _t["_last"] = now

    spark, store, cfg = st.spark, st.store, st.cfg
    _elig_cached = None
    use_delta = resolve_frontier_delta(cfg, store, r)
    if use_delta:
        frontier = store.read_frontier(r - 1)
        # deferral is DERIVED, not stored: a row first offers at
        # f = max(nb0, 1) and re-offers every delay_slots rounds until
        # selected — identical to the stored-bump semantics when the
        # per-host delay is constant (proved/tested in test_frontier_delta).
        # Under adaptive politeness the delay VARIES, so rows whose schedule
        # diverged carry a stored EXCEPTION (frontier_deferrals, sparse:
        # only offers made at mult>1, plus rows already on an exception —
        # once shifted, a row's phase never re-derives). Everything else
        # stays derived; the exception table is O(adapted slice of batch)
        # per round and folds away at every frontier base.
        defs = store.read_deferrals(r - 1) if cfg.adaptive_politeness else None
        anchor = F.greatest(F.col("not_before_round"), F.lit(1))
        modular = (anchor <= r) & (
            F.pmod(F.lit(r) - anchor, F.col("delay_slots")) == 0
        )
        if defs is not None:
            frontier = frontier.join(defs, "url_hash", "left")
            eligible = frontier.filter(
                F.when(
                    F.col("_nb_stored").isNotNull(), F.col("_nb_stored") <= r
                ).otherwise(modular)
            )
        else:
            eligible = frontier.filter(modular)
        # NOT persisted: the chain read is re-evaluated 2-3× per round
        # (host stats, window join), but caching the eligible slice
        # measured NEUTRAL at sf0.1 and -4% at the 1M-host tier (cache
        # materialization under memory pressure costs more than the
        # re-walk — BENCH notes round 3)
    else:
        if cfg.frontier_delta:
            # stored round under 'auto': the previous round may have been a
            # delta round, so materialize the stored-convention view (base ∪
            # chain with not_before_round = next offer round). Idempotent
            # when r-1 is itself a stored base — every nb there is already
            # > r-1, so the derived expression keeps it unchanged.
            frontier = _effective_frontier(store, r - 1)
        else:
            frontier = store.read(r - 1, "frontier")
        eligible = frontier.filter(F.col("not_before_round") <= r)
    prev_host_state = None
    if cfg.adaptive_politeness:
        if store.exists(r - 1, "host_state"):
            prev_host_state = store.read(r - 1, "host_state")
        eligible = rank.apply_adaptive(eligible, prev_host_state, cfg)

    # --- retry queue (opt-in cfg.fetch_retries): 503'd URLs re-enter
    # scheduling from their own small table — never through the frontier,
    # so neither frontier engine sees a re-added hash ----------------------
    sched_input = eligible
    q_elig = q_inelig = None
    if cfg.fetch_retries:
        sched_input = eligible.withColumn("retries", F.lit(0).cast("int"))
        if store.exists(r - 1, "retry_queue"):
            q = store.read(r - 1, "retry_queue")
            q_elig = q.filter(F.col("not_before_round") <= r)
            q_inelig = q.filter(F.col("not_before_round") > r)
            if cfg.adaptive_politeness:
                q_elig = rank.apply_adaptive(q_elig, prev_host_state, cfg)
            for c in sched_input.columns:
                if c not in q_elig.columns:  # e.g. the delta engine's _nb_stored
                    q_elig = q_elig.withColumn(c, F.lit(None).cast("int"))
            sched_input = sched_input.unionByName(q_elig.select(*sched_input.columns))

    # --- schedule (W1/W2 salted two-phase + O3 cap + S10 order) ------------
    # attach_boosts: opt-in host-priority boosts (config.host_boosts) lead
    # the emission sort so boosted hosts win the capacity cap; the
    # transient column is dropped before anything persists.
    if cfg.priority_aging_every:
        # starvation freedom (config.priority_aging_every): transient
        # effective priority for the scheduling order only — the stored
        # base priority never changes
        sched_input = sched_input.withColumn(
            "_aged",
            (
                F.col("priority")
                - F.floor(
                    (F.lit(r) - F.col("discovered_round"))
                    / F.lit(int(cfg.priority_aging_every))
                )
            ).cast("int"),
        )
    host_capped = rank.select_batch(sched_input, st.robots_df, cfg)
    n_ip_capped = 0
    _ipcap_cached = None
    if cfg.ip_politeness_groups:
        # per-IP politeness (rank.ip_cap): dropped rows simply never reach
        # `ordered`, so they stay in the frontier and take the normal
        # deferral bump — no extra state. The pre-cap count rides a
        # map-side Observation (pre-shuffle: executed exactly once); the
        # post-cap count is a real count over the PERSISTED cap output —
        # NOT a second Observation, because with_seq's scalable path
        # (range-sampling + sizes jobs) re-executes post-window stages and
        # double-counts any CollectMetrics above the window shuffle
        # (measured: post-cap metric = 2× on the CLI path). The persist is
        # the same batch `ordered` caches anyway, and the count that
        # materializes it lets with_seq's extra jobs read cache instead of
        # recomputing the window.
        obs_ipin = Observation()
        host_capped = rank.ip_cap(
            host_capped.observe(obs_ipin, F.count(F.lit(1)).alias("n")),
            cfg.ip_politeness_groups,
            cfg.ip_budget,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _ipcap_cached = host_capped
        n_ip_kept = host_capped.count()  # materializes + resolves obs_ipin
        n_ip_capped = int(obs_ipin.get["n"]) - n_ip_kept
    selected = rank.attach_boosts(host_capped, cfg, boosts_df=st.boosts_df)
    # a-priori batch bound: per-host selection emits ≤ B rows per host (and
    # retry/recrawl re-entries compete under the same per-host window), so
    # the uncapped batch is ≤ n_hosts × B. Below cfg.seq_window_max_rows the
    # single-window with_seq path is output-identical and saves the scalable
    # path's two extra jobs per round — the range-partition sampling job
    # re-executes the whole scheduling window chain (config.py note).
    _batch_bound = (
        st.n_hosts * max(1, cfg.max_fetches_per_host_per_round)
        if st.n_hosts is not None
        else None
    )
    seq_df = rank.with_seq(
        rank.cap_round(selected, cfg),
        scalable=cfg.round_capacity is None
        and (_batch_bound is None or _batch_bound > cfg.seq_window_max_rows),
    )
    ordered = seq_df.drop("boost").persist(StorageLevel.MEMORY_AND_DISK)
    # with_seq's scalable path hangs its persisted inner frame on the
    # result; re-attach it across the drop so the round-end unpersist
    # (see _cs_cached below) still releases it.
    if hasattr(seq_df, "_cs_cached"):
        ordered._cs_cached = seq_df._cs_cached
    obs_sel = Observation()
    # n_from_frontier: selected rows that actually came OUT of the frontier
    # (retry-queue rows — retries > 0 — never were in it), so the delta
    # engine's running frontier counter subtracts the right amount
    _sel_aggs = [F.count(F.lit(1)).alias("n")]
    if cfg.fetch_retries:
        _sel_aggs.append(
            F.sum((F.col("retries") == 0).cast("long")).alias("n_frontier_sel")
        )
    store.write(
        ordered.observe(obs_sel, *_sel_aggs).select(
            F.lit(r).cast("int").alias("round"),
            "seq",
            "url",
            "url_hash",
            "host_hash",
        ),
        r,
        "crawl_order",
    )
    n_selected = int(obs_sel.get["n"])
    n_frontier_sel = (
        int(obs_sel.get["n_frontier_sel"] or 0) if cfg.fetch_retries else n_selected
    )
    # the selected batch's url_hash side for the advance anti-joins below:
    # n_selected is exact (Observation), so small batches broadcast and the
    # frontier rewrite runs exchange-free; large batches keep the shuffle
    # join (cfg.selected_broadcast_max_rows — guide-§8 "decide with small
    # rows" applied to the frontier advance). The flag also selects the
    # advance SHAPE below: only the broadcast regime may scan the whole
    # frontier in one pass.
    sel_small = n_selected <= cfg.selected_broadcast_max_rows
    sel_hashes = ordered.select("url_hash")
    if sel_small:
        sel_hashes = F.broadcast(sel_hashes)
    _tick("schedule")

    # --- fetch (U-5) -> documents sink (S5) --------------------------------
    fetch_fn = (
        fetch_mod.fetch_selected if cfg.fetch_arrow else fetch_mod.fetch_selected_pandas
    )
    # task sizing from the exact batch count: full parallelism for big
    # rounds, no per-core Python-worker/file overhead for tiny ones
    # (cfg.fetch_rows_per_task)
    _fetch_par = max(
        1,
        min(
            spark.sparkContext.defaultParallelism,
            -(-n_selected // max(1, cfg.fetch_rows_per_task)),
        ),
    )
    docs = fetch_fn(ordered, r, st.spec, parallelism=_fetch_par)
    # --- conditional refetch (opt-in cfg.conditional_fetch): a refetch
    # whose content fingerprint matches the recrawl_state validator is
    # classified 304 — status rewritten, spans EMPTIED before the sink
    # (nothing re-stored/re-parsed). slice(spans, 1, 0) keeps the exact
    # span struct type. Only URLs present in last round's state can carry
    # a validator, so first fetches are untouched by construction. -------
    n_not_modified = 0
    obs_304 = None
    _rs_prev = store.read_recrawl(r - 1) if cfg.conditional_fetch else None
    if _rs_prev is not None:
        validators = _rs_prev.select(
            "url", F.col("fingerprint").alias("_validator")
        )
        obs_304 = Observation()
        docs = fetch_mod.revalidate(docs, validators).observe(
            obs_304, F.sum((F.col("status") == 304).cast("long")).alias("n")
        )
    store.write(docs, r, "documents")
    if obs_304 is not None:
        n_not_modified = int(obs_304.get["n"] or 0)
    docs_r = store.read(r, "documents")  # re-read: fetch runs exactly once
    if cfg.adaptive_politeness:
        # next round's per-host backoff from THIS round's observed outcomes
        store.write(
            rank.adaptive_host_state(docs_r, prev_host_state, cfg), r, "host_state"
        )
    _tick("fetch")

    # --- content-seen dedup (opt-in): suppress link extraction for docs
    # whose content digest was already sighted (config.content_dedup) -----
    docs_parse = docs_r
    n_content_dups = 0
    if cfg.content_dedup:
        from .parse import content_fingerprint

        obs_200 = Observation()
        d200 = (
            docs_r.filter(F.col("status") == 200)
            .observe(obs_200, F.count(F.lit(1)).alias("n"))
            .withColumn("content_hash", content_fingerprint(F.col("spans")))
        )
        # first sighting wins: min url within the round; digests already in
        # the accumulated table drop via the anti-join (shuffle keyed on the
        # digest — nothing corpus-derived is broadcast)
        winners = d200.groupBy("content_hash").agg(F.min("url").alias("url"))
        prev_content = store.read_all("content_seen", r - 1)
        if prev_content is not None:
            winners = winners.hint("shuffle_hash").join(
                prev_content.select("content_hash"), "content_hash", "left_anti"
            )
        obs_keep = Observation()
        store.write(
            winners.observe(obs_keep, F.count(F.lit(1)).alias("n")).select(
                "content_hash", "url"
            ),
            r,
            "content_seen",
        )
        n_content_dups = int(obs_200.get["n"]) - int(obs_keep.get["n"])
        # re-read the just-written keepers (exactly-once, resume-identical)
        kept = store.read(r, "content_seen").select("url")
        docs_parse = docs_r.filter(F.col("status") != 200).unionByName(
            docs_r.filter(F.col("status") == 200).join(kept, "url", "left_semi")
        )
        _tick("content_dedup")

    # --- retry-queue advance (opt-in): re-queue this round's 503s with
    # exponential backoff, bump non-selected eligible queue rows like the
    # frontier's deferral, keep ineligible rows; whole-queue rewrite is
    # O(recent failures), never O(frontier) --------------------------------
    n_retry_queue = 0
    if cfg.fetch_retries:
        rq_cols = [f.name for f in FRONTIER.fields] + ["retries"]
        failed = docs_r.filter(F.col("status") == 503).select("url")
        fail_rows = (
            sched_input.join(failed, "url", "left_semi")
            .filter(F.col("retries") < cfg.fetch_retries)
            .withColumn("retries", (F.col("retries") + 1).cast("int"))
            .withColumn(
                "not_before_round",
                (F.lit(r) + F.expr("shiftleft(1, retries)")).cast("int"),
            )
            .withColumn("state", F.lit("retry"))
        )
        queue_next = fail_rows.select(*rq_cols)
        if q_elig is not None:
            mult_col = F.col("mult") if "mult" in q_elig.columns else F.lit(1)
            remain = (
                q_elig.join(sel_hashes, "url_hash", "left_anti")
                .withColumn(
                    "not_before_round",
                    (F.lit(r) + F.col("delay_slots") * mult_col).cast("int"),
                )
            )
            queue_next = queue_next.unionByName(remain.select(*rq_cols)).unionByName(
                q_inelig.select(*rq_cols)
            )
        obs_rq = Observation()
        store.write(
            queue_next.observe(obs_rq, F.count(F.lit(1)).alias("n")),
            r,
            "retry_queue",
        )
        n_retry_queue = int(obs_rq.get["n"])
        _tick("retry_queue")

    # --- closed-loop recrawl (opt-in cfg.recrawl_every): fold this round's
    # fetch outcomes into recrawl_state (sitemaps.recrawl_state_merge); on
    # cadence rounds latch due rows (sitemaps.recrawl_due) and re-enqueue
    # them at the frontier advance below. Exactly-once discipline: the
    # re-enqueued set is re-READ from the just-written state
    # (enqueued_round == r), same pattern as content_seen. Seen/bloom/
    # quota are deliberately untouched — a refresh is not a discovery. ----
    n_recrawled = 0
    recrawl_rows = None
    n_recrawl_state = None
    if cfg.recrawl_every:
        from .parse import content_fingerprint
        from . import sitemaps as _sm

        use_rdelta = resolve_recrawl_delta(cfg, store, r)
        prev_rstate = store.read_recrawl(r - 1)
        fetched_now = docs_r.select(
            "url",
            "status",
            F.when(
                F.col("status") == 200, content_fingerprint(F.col("spans"))
            ).alias("fingerprint"),
        ).join(
            # the scheduler batch drops `host` for shuffle hygiene; on the
            # canonical URL parse_url(HOST) IS the stored host (the same
            # equivalence the salted scheduler already keys on, rank.py)
            ordered.select(
                "url",
                "url_hash",
                F.expr("parse_url(url, 'HOST')").alias("host"),
                "host_hash",
                "priority",
                "crawl_depth",
            ),
            "url",
        )
        due_round = r % cfg.recrawl_every == 0

        def _enqueue_rows(src_df):
            return rank.attach_host_budget(
                src_df.filter(F.col("enqueued_round") == r)
                .select(
                    "url",
                    "url_hash",
                    "host",
                    "host_hash",
                    "priority",
                    "crawl_depth",
                )
                .withColumn("discovered_round", F.lit(r))
                .withColumn("not_before_round", F.lit(r + 1))
                .withColumn("state", F.lit("pending")),
                st.robots_df,
                cfg,
            )

        if use_rdelta and prev_rstate is not None:
            # --- delta engine (cfg.recrawl_delta): write ONLY the rows
            # this round touches (fetched + newly tracked + due-latched)
            # — O(batch + due), never O(state). The restricted merge is
            # exact because the merge changes a row iff its url_hash was
            # fetched; due rows are provably disjoint (a row fetched this
            # round has last_fetch_round == r, never due). ---------------
            prev_slice = prev_rstate.join(
                fetched_now.select("url_hash"), "url_hash", "semi"
            )
            delta = _sm.recrawl_state_merge(
                prev_slice, fetched_now, r, keep_new_marker=True
            )
            if due_round:
                full = _sm.recrawl_state_merge(prev_rstate, fetched_now, r)
                d = _sm.recrawl_due(full, r, cfg.recrawl_interval)
                delta = delta.unionByName(
                    d.filter(F.col("due"))
                    .withColumn("enqueued_round", F.lit(r).cast("int"))
                    .drop("due", "recrawl_mult4")
                    .withColumn("_is_new", F.lit(False))
                )
            obs_rc = Observation()
            delta = delta.observe(
                obs_rc,
                F.coalesce(
                    F.sum((F.col("enqueued_round") == F.lit(r)).cast("long")),
                    F.lit(0),
                ).alias("n"),
                F.coalesce(
                    F.sum(F.col("_is_new").cast("long")), F.lit(0)
                ).alias("n_new"),
            )
            store.write(
                delta.drop("_is_new").withColumn(
                    "_rsv", F.lit(int(r)).cast("int")
                ),
                r,
                "recrawl_state_delta",
            )
            n_recrawled = int(obs_rc.get["n"] or 0) if due_round else 0
            prev_info = store.read_manifest().get("round_info", {}).get(
                str(r - 1), {}
            )
            if prev_info.get("recrawl_rows") is not None:
                n_recrawl_state = int(prev_info["recrawl_rows"]) + int(
                    obs_rc.get["n_new"] or 0
                )
            if n_recrawled:
                recrawl_rows = _enqueue_rows(
                    store.read(r, "recrawl_state_delta")
                )
            if cfg.compact_recrawl_every and r % cfg.compact_recrawl_every == 0:
                # fold the chain: resolved full state becomes a new base
                # (the compact_seen / frontier-base discipline)
                store.write(store.read_recrawl(r), r, "recrawl_state")
                store.record_recrawl_base(r)
        else:
            # --- stored engine: one columnar whole-state rewrite; the
            # full dir doubles as a delta-chain base so the two round
            # kinds interleave freely on one checkpoint -------------------
            rstate = _sm.recrawl_state_merge(prev_rstate, fetched_now, r)
            obs_rc = None
            if due_round:
                d = _sm.recrawl_due(rstate, r, cfg.recrawl_interval)
                obs_rc = Observation()
                rstate = d.withColumn(
                    "enqueued_round",
                    F.when(F.col("due"), F.lit(r))
                    .otherwise(F.col("enqueued_round"))
                    .cast("int"),
                ).drop("due", "recrawl_mult4").observe(
                    obs_rc,
                    F.sum(
                        (F.col("enqueued_round") == F.lit(r)).cast("long")
                    ).alias("n"),
                )
            obs_rn = Observation()
            rstate = rstate.observe(obs_rn, F.count(F.lit(1)).alias("n_rows"))
            store.write(rstate, r, "recrawl_state")
            store.record_recrawl_base(r)
            n_recrawl_state = int(obs_rn.get["n_rows"] or 0)
            if obs_rc is not None:
                n_recrawled = int(obs_rc.get["n"] or 0)
            if n_recrawled:
                recrawl_rows = _enqueue_rows(store.read(r, "recrawl_state"))
        _tick("recrawl")

    # --- parse (U-6) -> candidates -> new (J1): single fused Arrow pass ----
    seen_df = store.read_seen(r - 1)
    relational_bloom = resolve_bloom_relational(cfg)
    cands = cand_mod.candidate_rows(
        docs_parse,
        cfg,
        st.rules_bcast(),
        None if relational_bloom else st.bloom_broadcasts(),
        robots_df=st.robots_df,
        relational=st.robots_relational,
    )
    obs_uq = None
    if cfg.url_quality_filter:
        # opt-in pre-fetch URL policy filter (config.py): blocklisted /
        # media-extension candidates drop HERE — after canon+robots, before
        # the bloom probe and exact anti-join, so they never cost a probe
        # and never enter seen/frontier. The dropped count rides the
        # candidate pass as an Observation (CollectMetrics is a pushdown
        # barrier, so the filter below cannot leak past the count); the
        # oracle applies textops.url_quality_keep_py at the same stage.
        from . import textops

        obs_uq = Observation()
        cands = cands.observe(
            obs_uq,
            F.sum(
                (~textops.url_quality_keep(F.col("url"))).cast("long")
            ).alias("n_filtered"),
        ).filter(textops.url_quality_keep(F.col("url")))
    if relational_bloom and cfg.use_bloom_prefilter:
        # executor-side probe: cogroup on bucket against the blob ROWS —
        # no broadcast payload, no driver registry (scale path, config.py)
        cands = seen_mod.probe_relational(
            cands.drop("maybe_seen"), store.read_bloom_chain(r - 1)
        )
    cands = cands.persist(StorageLevel.MEMORY_AND_DISK)
    new = cand_mod.split_new(cands, seen_df, n_buckets=cfg.n_buckets)
    # --- per-host page quota (opt-in cfg.host_page_quota): frontier
    # admission control — rank this round's new rows per host, keep only
    # quota - used (used = chain-sum of the tiny per-host counts table) ---
    obs_qd = None
    if cfg.host_page_quota:
        from pyspark.sql import Window as _W

        quota = int(cfg.host_page_quota)
        counts_prev = store.read_all("host_counts", r - 1)
        wq = _W.partitionBy("host_hash").orderBy(
            "priority", "crawl_depth", "url_hash", "url"
        )
        ranked = new.withColumn("_qrank", F.row_number().over(wq))
        if counts_prev is not None:
            used = counts_prev.groupBy("host_hash").agg(F.sum("n").alias("_used"))
            ranked = ranked.join(used, "host_hash", "left")
        else:
            ranked = ranked.withColumn("_used", F.lit(None).cast("long"))
        room = F.lit(quota) - F.coalesce(F.col("_used"), F.lit(0))
        obs_qd = Observation()
        new = (
            ranked.observe(
                obs_qd,
                F.sum((F.col("_qrank") > room).cast("long")).alias("nd"),
            )
            .filter(F.col("_qrank") <= room)
            .drop("_qrank", "_used")
        )
    new = new.persist(StorageLevel.MEMORY_AND_DISK)
    # ONE serial materialization of the candidate chain: the count pins
    # cands/new in cache, yields n_new directly, and resolves every
    # upstream Observation exactly once (racing two first-materializations
    # would double-fire CollectMetrics — the ip_cap note's hazard).
    # Everything that then CONSUMES the cached batch — the seen_delta
    # write, bloom upkeep, lineage/metrics — is independent of the
    # frontier advance, so it all rides the pool and overlaps the advance;
    # every future is joined before the round commits (exact resume).
    n_new = new.count()
    n_quota_dropped = 0
    if cfg.host_page_quota:
        # the count above already forced the observed pass
        n_quota_dropped = int(obs_qd.get["nd"] or 0)
    pool = None
    futures = []
    # overlap needs >1 task slot: at local[1] concurrent jobs only
    # interleave stage scheduling on the single slot, so run serial there
    if cfg.async_lineage_metrics and spark.sparkContext.defaultParallelism > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=4)

    def _submit(fn, *a) -> None:
        if pool is not None:
            futures.append(pool.submit(fn, *a))
        else:
            fn(*a)

    # O2 layout: the delta stays bucket-clustered, sorted by url_hash —
    # keeps the append-only seen table physically partition-prunable by
    # bucket (growth rebuilds, co-located anti-joins at scale). With the
    # round-8 candidate keying, `new` is ALREADY hash(bucket)-partitioned
    # (candidate_rows' one bucket exchange flows through the anti-join
    # branches), so the write needs no exchange of its own; the quota
    # path re-keys by host_hash mid-stream, so only it restores the
    # layout explicitly.
    _seen_rows = new.select("url_hash", "url", "bucket")
    if cfg.host_page_quota:
        _seen_rows = _seen_rows.repartition(F.col("bucket"))
    _submit(
        store.write,
        _seen_rows.sortWithinPartitions("url_hash"),
        r,
        "seen_delta",
    )
    if cfg.host_page_quota:
        _submit(
            store.write,
            new.groupBy("host_hash").agg(F.count(F.lit(1)).cast("long").alias("n")),
            r,
            "host_counts",
        )

    _tick("parse_dedup")

    def _bloom_maintenance() -> None:
        # broadcast-mode registry upkeep: partial-blob collect + driver OR +
        # snapshot write + rebroadcast. All of it feeds ONLY next round's
        # probes (this round's candidate pass already ran) and touches no
        # manifest state, so it overlaps the frontier advance below when the
        # async pool is on (config.async_lineage_metrics note); joined
        # before commit either way.
        delta, grew = _absorb_new_into_registry(new, st.registry, store, r, cfg)
        _write_bloom(spark, store, st.registry, r)
        _refresh_bloom_broadcast(st, delta, grew)

    if relational_bloom:
        # O(batch) delta: this round's partial blobs land as parquet rows —
        # no collect, no driver OR, no re-broadcast; the chain is compacted
        # (merge or grow) distributed every bloom_rebroadcast_every rounds.
        # Stays serial: compaction records manifest bases, which must not
        # race the round commit's manifest read-modify-write.
        store.write(
            seen_mod.partial_bloom_blobs(
                new, st.bloom_delta_params(),
                bloom_params(cfg.bloom_capacity_per_bucket, cfg.bloom_fpp),
            ),
            r,
            "bloom_delta",
        )
        if cfg.bloom_rebroadcast_every and r % cfg.bloom_rebroadcast_every == 0:
            _compact_bloom(st, r)
    else:
        _submit(_bloom_maintenance)
    _tick("bloom")

    # --- lineage + metrics (S9/A4): independent of the frontier advance, so
    # they run on background threads overlapped with it (joined pre-commit)
    lineage = metrics.partition_lineage(ordered, r, "selected").unionByName(
        metrics.partition_lineage(new, r, "new")
    )
    n_url_filtered = 0
    if obs_uq is not None:
        # the new.count() above already forced the candidate pass, so this
        # get is a no-wait read; sum() over an empty batch is NULL → or-0
        n_url_filtered = int(obs_uq.get["n_filtered"] or 0)
        lineage = lineage.unionByName(
            metrics.scalar_lineage(spark, r, "url_filtered", n_url_filtered)
        )
    if cfg.content_dedup:
        lineage = lineage.unionByName(
            metrics.scalar_lineage(spark, r, "content_dups", n_content_dups)
        )
    if cfg.host_page_quota:
        lineage = lineage.unionByName(
            metrics.scalar_lineage(spark, r, "quota_dropped", n_quota_dropped)
        )
    if cfg.recrawl_every:
        lineage = lineage.unionByName(
            metrics.scalar_lineage(spark, r, "recrawled", n_recrawled)
        )
    if cfg.conditional_fetch:
        lineage = lineage.unionByName(
            metrics.scalar_lineage(spark, r, "not_modified", n_not_modified)
        )
    if cfg.ip_politeness_groups:
        lineage = lineage.unionByName(
            metrics.scalar_lineage(spark, r, "ip_capped", n_ip_capped)
        )
    fetch_m = metrics.fetch_metrics(docs_r, r)
    _submit(store.write, lineage, r, "lineage")
    _submit(store.write, fetch_m, r, "metrics")

    # --- frontier advance (U1/U2 + W3 deferral) ----------------------------
    new_frontier_rows = rank.attach_host_budget(
        new.withColumn("discovered_round", F.lit(r))
        .withColumn("not_before_round", F.lit(r + 1))
        .withColumn("state", F.lit("pending")),
        st.robots_df,
        cfg,
    )
    # re-enqueued recrawl rows (opt-in, above) enter the frontier exactly
    # like new discoveries — but ONLY the frontier: never seen/bloom/quota
    incoming = _frontier_shape(new_frontier_rows)
    if recrawl_rows is not None:
        incoming = incoming.unionByName(_frontier_shape(recrawl_rows))
    if use_delta:
        # O(batch) IO: selected hashes out, new rows in — the deferral bump
        # for everything else is derived at read time, never written.
        # One combined op-tagged write per round (io_tables docstring).
        store.write_frontier_delta(incoming, ordered, r)
        if cfg.adaptive_politeness and (
            prev_host_state is not None or "_nb_stored" in eligible.columns
        ):
            # stored exceptions: offered-not-selected rows whose deferral
            # can't be re-derived (mult>1 now, or phase already shifted)
            mult_col = F.col("mult") if "mult" in eligible.columns else F.lit(1)
            stored = (
                F.col("_nb_stored").isNotNull()
                if "_nb_stored" in eligible.columns
                else F.lit(False)
            )
            exceptions = (
                eligible.join(sel_hashes, "url_hash", "left_anti")
                .filter((mult_col > 1) | stored)
                .select(
                    "url_hash",
                    (F.lit(r) + F.col("delay_slots") * mult_col)
                    .cast("int")
                    .alias("not_before_round"),
                )
            )
            store.write(exceptions, r, "frontier_deferrals")
        prev_info = store.read_manifest().get("round_info", {}).get(str(r - 1), {})
        if "frontier" not in prev_info:
            raise RuntimeError(
                f"round {r - 1} committed without a frontier counter — the "
                "delta engine cannot maintain the running frontier size"
            )
        n_frontier = int(prev_info["frontier"]) - n_frontier_sel + n_new + n_recrawled
        if cfg.compact_frontier_every and r % cfg.compact_frontier_every == 0:
            # fold: base rows carry the CURRENT stored-convention nb (next
            # offer round), so derived phase re-anchors and the exception
            # dirs before the base can be dropped from every future read
            store.write(_frontier_shape(_effective_frontier(store, r)), r, "frontier")
            store.record_frontier_base(r)
    else:
        # delay_slots is a frontier column (attached at ingest) — no join;
        # under adaptive politeness the transient `mult` rides the same
        # broadcast host_state join the scheduling slice uses (the
        # persisted base stays unscaled).
        adv = frontier
        if cfg.adaptive_politeness and prev_host_state is not None:
            adv = rank.apply_adaptive(adv, prev_host_state, cfg)
        delay_eff = F.col("delay_slots") * (
            F.col("mult") if "mult" in adv.columns else F.lit(1)
        )
        _nb = F.col("not_before_round")
        if sel_small:
            # Broadcast regime: ONE scan of the frontier — drop selected
            # rows (exchange-free broadcast anti-join), bump the eligible
            # remainder's deferral, keep ineligible rows unchanged.
            # Set-identical to the two-branch form below (selected ⊆
            # eligible, so the anti-join over the whole frontier drops
            # exactly the same rows), with one scan and one fewer union
            # branch. Probing ineligible rows costs a hash lookup per row,
            # never a shuffle — this shape is gated on the broadcast for
            # that reason.
            remain = adv.join(sel_hashes, "url_hash", "left_anti").withColumn(
                "not_before_round",
                F.when(_nb <= r, F.lit(r) + delay_eff).otherwise(_nb).cast("int"),
            )
            frontier_next = _frontier_shape(remain).unionByName(incoming)
        else:
            # Shuffle regime (selected batch above the broadcast cap):
            # anti-join ONLY the eligible slice — shuffling the whole
            # frontier (ineligible rows included) through the exchange
            # would be O(frontier) extra shuffle bytes per round for rows
            # the join cannot touch; ineligible rows ride through unjoined.
            deferred = (
                adv.filter(_nb <= r)
                .join(sel_hashes, "url_hash", "left_anti")
                .withColumn(
                    "not_before_round", (F.lit(r) + delay_eff).cast("int")
                )
            )
            frontier_next = (
                _frontier_shape(deferred)
                .unionByName(_frontier_shape(adv.filter(_nb > r)))
                .unionByName(incoming)
            )
        obs_fr = Observation()
        store.write(
            frontier_next.observe(obs_fr, F.count(F.lit(1)).alias("n")), r, "frontier"
        )
        n_frontier = int(obs_fr.get["n"])
        if cfg.frontier_delta:
            # 'auto' stored round: the full frontier just written IS a base
            # (stored-convention nb) — record it so a later delta round
            # chains from here and earlier deferral exceptions fold away
            store.record_frontier_base(r)
    _tick("frontier")

    if pool is not None:
        for f in futures:
            f.result()  # must land before the round commits (exact resume)
        pool.shutdown(wait=False)
    _tick("lineage_metrics")
    if _timing:
        _t.pop("_last", None)
        print(f"[timing] round {r}: {_t}")

    info_counters = {"selected": n_selected, "new": n_new, "frontier": n_frontier}
    if cfg.url_quality_filter:
        info_counters["url_filtered"] = n_url_filtered
    if cfg.content_dedup:
        info_counters["content_dups"] = n_content_dups
    if cfg.fetch_retries:
        info_counters["retry_queue"] = n_retry_queue
    if cfg.host_page_quota:
        info_counters["quota_dropped"] = n_quota_dropped
    if cfg.recrawl_every:
        info_counters["recrawled"] = n_recrawled
        if n_recrawl_state is not None:
            # tracked-row counter: resolve_recrawl_delta's 'auto' input
            info_counters["recrawl_rows"] = n_recrawl_state
    if cfg.conditional_fetch:
        info_counters["not_modified"] = n_not_modified
    if cfg.ip_politeness_groups:
        info_counters["ip_capped"] = n_ip_capped
    store.commit_round(r, info_counters)
    if _elig_cached is not None:
        _elig_cached.unpersist()
    if _ipcap_cached is not None:
        _ipcap_cached.unpersist()
    ordered.unpersist()
    inner = getattr(ordered, "_cs_cached", None)
    if inner is not None:
        inner.unpersist()
    cands.unpersist()
    new.unpersist()
    st.next_round = r + 1
    return {"round": r, **info_counters}


def run_crawl(st: CrawlState, max_rounds: int) -> list[dict]:
    """Drive rounds until the frontier drains or max_rounds is hit."""
    out = []
    for r in range(st.next_round, max_rounds + 1):
        info = crawl_round(st, r)
        out.append(info)
        every = st.cfg.compact_seen_every
        if every and r % every == 0:
            st.store.compact_seen(r)
        if info["frontier"] == 0 and info.get("retry_queue", 0) == 0:
            break
    return out


def read_crawl_order(st: CrawlState, upto_round: int | None = None) -> DataFrame:
    upto = upto_round if upto_round is not None else st.next_round - 1
    df = st.store.read_all("crawl_order", upto)
    if df is None:
        return st.spark.createDataFrame([], CRAWL_ORDER)
    return df.orderBy("round", "seq")


def _effective_frontier(store: SnapshotStore, r: int) -> DataFrame:
    """Delta-engine frontier AFTER round r with not_before_round in the
    stored-engine/oracle convention (next offer round, strictly > r):
    stored exceptions win, everything else derives from (anchor, delay)."""
    f = store.read_frontier(r)
    nb = F.col("not_before_round")
    d = F.col("delay_slots")
    anchor = F.greatest(nb, F.lit(1))
    derived = F.when(anchor > r, nb).otherwise(
        anchor + d * (F.floor((F.lit(r) - anchor) / d) + 1)
    )
    defs = store.read_deferrals(r)
    if defs is not None:
        f = f.join(defs, "url_hash", "left")
        cur = F.coalesce(F.col("_nb_stored"), derived)
        return f.withColumn("not_before_round", cur.cast("int")).drop("_nb_stored")
    return f.withColumn("not_before_round", derived.cast("int"))


def read_frontier_view(st: CrawlState, r: int) -> DataFrame:
    """Frontier AFTER round r with not_before_round presented in the
    stored-engine/oracle convention. The delta engine keeps the ORIGINAL
    nb₀ on disk (deferrals derived; adaptive exceptions stored sparsely);
    this view reconstructs the current value so snapshot comparisons
    against the oracle are engine-independent."""
    if not st.cfg.frontier_delta:
        return st.store.read(r, "frontier")
    return _effective_frontier(st.store, r)


def read_final_seen(st: CrawlState, upto_round: int | None = None) -> DataFrame:
    upto = upto_round if upto_round is not None else st.next_round - 1
    return st.store.read_seen(upto)
