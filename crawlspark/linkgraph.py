"""Host-level link-graph analytics over interleaved span documents.

A crawler's frontier prioritization ultimately wants graph signals: which
hosts are heavily linked, by whom, and with what anchor text. Heroshi's
frontier treats priority as an input column (SURVEY.md §3 W1/W2); this
module computes the classic priority *sources* — a weighted host graph,
PageRank over it, and per-target anchor-text statistics — Spark-first and
oracle-mirrored (every operator has an exact DuckDB SQL twin in
__spark_entry__.py).

Everything is pure JVM (built-in functions only — no Python UDFs):

- ``host_edges``: explode link spans once, resolve the target *authority*
  (absolute ref → its own host; path-absolute / dotted-relative ref → the
  source host — full URL resolution is U-2 ``resolve_batch``'s job; at the
  host level only the authority matters), then ONE map-side-combined
  groupBy. Scale shape: linear scan + one shuffle on (src_host, dst_host),
  output is host-pair-sized (≪ corpus).
- ``host_pagerank``: weighted power iteration with a FIXED iteration count
  so the whole computation is one lazy Catalyst plan (no driver loop state,
  no eager job at construction — the same laziness discipline the advisor
  required of token_shards). Each iteration is join(share, rank) →
  groupBy(dst) → left join back to the node set; all joins key on host
  strings over a host-cardinality table (tiny relative to the corpus — the
  graph aggregate is the scale reduction, the iterations run over it).
  Dangling hosts (no outlinks) simply leak their mass, the standard
  simplification; ranks then sum to < 1 but the ORDERING — the thing a
  scheduler consumes — is unaffected. For very large host sets callers
  pass ``persist_shares=True`` so the per-edge share table (reused by every
  iteration) is computed once instead of per-iteration.
- ``anchor_stats``: per target host, inlink totals plus the modal anchor
  text (ties broken lexicographically — deterministic at any parallelism).

Float discipline: ranks are rounded to 6 decimals at the OUTPUT only
(iterations keep full double precision); matches the repo-wide
cross-engine convention (textops/simsearch round(·, 6)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# authority component of an absolute URL/ref; mirrored verbatim in DuckDB
HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/]+)"


def _link_spans(docs: DataFrame) -> DataFrame:
    """(src_host, anchor, ref) — one row per link span. ``docs`` must carry
    ``url`` (the document's own URL) and ``spans``."""
    ls = docs.select(
        F.regexp_extract("url", HOST_RE, 1).alias("src_host"),
        F.explode(
            F.filter(
                "spans",
                lambda s: (s["kind"] == "link")
                & s["media_ref"].isNotNull()
                & (s["media_ref"] != ""),
            )
        ).alias("s"),
    )
    return ls.select(
        "src_host",
        F.col("s.text").alias("anchor"),
        F.col("s.media_ref").alias("ref"),
    )


def _dst_host():
    """Target authority: absolute ref → its host, else (path-absolute or
    dotted-relative) the source host."""
    return F.when(
        F.col("ref").rlike(HOST_RE), F.regexp_extract("ref", HOST_RE, 1)
    ).otherwise(F.col("src_host"))


def host_edges(docs: DataFrame) -> DataFrame:
    """Weighted host link graph: (src_host, dst_host, n_links).

    One explode + one groupBy; the aggregate is host-pair-sized, so this is
    the step that reduces a 100 TB document scan to a graph that the
    iterative operators below can afford to re-join repeatedly."""
    e = _link_spans(docs).select("src_host", _dst_host().alias("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links")
    )


def host_pagerank(
    edges: DataFrame,
    n_iter: int = 5,
    damping: float = 0.85,
    persist_shares: bool = False,
) -> DataFrame:
    """Weighted PageRank over (src_host, dst_host, n_links) → (host, pr).
    (The value column is named ``pr`` — ``rank`` is a window-function
    keyword in some engines.)

    pr_{k+1}(v) = (1-d)/N + d * Σ_{u→v} pr_k(u) · w(u,v)/W_out(u),
    N computed INSIDE the plan (1-row aggregate, broadcast) so construction
    stays lazy. ``n_iter`` is fixed — the oracle unrolls the same
    iterations as a CTE chain, and a fixed count keeps the Catalyst plan
    finite and the result deterministic (no convergence-threshold races
    across engines)."""
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("w_out"))
    share = edges.join(out_w, "src_host").select(
        "src_host",
        "dst_host",
        (F.col("n_links").cast("double") / F.col("w_out")).alias("share"),
    )
    if persist_shares:
        share = share.localCheckpoint(eager=False)
    base = nodes.crossJoin(F.broadcast(n1))  # (host, n_nodes)
    rank = base.select("host", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("pr"))
    for _ in range(n_iter):
        contrib = (
            share.join(rank, share["src_host"] == rank["host"])
            .groupBy("dst_host")
            .agg(F.sum(F.col("pr") * F.col("share")).alias("c"))
        )
        rank = (
            base.join(contrib, base["host"] == contrib["dst_host"], "left")
            .select(
                "host",
                "n_nodes",
                (
                    (1.0 - damping) / F.col("n_nodes")
                    + damping * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("pr"),
            )
        )
    return rank.select("host", F.round("pr", 6).alias("pr"))


def pagerank_boosts(
    ranks: DataFrame, n_tiers: int = 4
) -> tuple[tuple[str, int], ...]:
    """Quantize (host, pr) into the ``CrawlConfig.host_boosts`` shape: hosts
    are split into ``n_tiers`` ntiles by descending rank (ties broken by
    host — total order, deterministic), and tier t gets boost t−n_tiers
    (best tier most negative, worst tier 0 = same as unlisted hosts, so
    absent/new hosts schedule with the lowest-signal tier rather than
    jumping the queue).

    Driver-side by design: the config tuple is the policy hand-off for
    host sets that fit the driver (≲10^6). At the 10^10-URL design point
    use ``pagerank_boosts_df`` below — the same ntile tiers as a lazy
    (host_hash, boost) DataFrame, no collect, no global window — and pass
    it to ``rank.attach_boosts(..., boosts_df=...)``."""
    w = Window.orderBy(F.col("pr").desc(), F.col("host").asc())
    tiers = ranks.select("host", F.ntile(n_tiers).over(w).alias("tier"))
    return tuple(
        (r["host"], int(r["tier"]) - n_tiers) for r in tiers.collect()
    )


def pagerank_boosts_df(
    ranks: DataFrame,
    n_tiers: int = 4,
    n_buckets: int = 32,
    key: str = "host_hash",
) -> DataFrame:
    """Relational twin of ``pagerank_boosts`` for host sets that do NOT fit
    the driver (the 10^8–10^9-host tier): a lazy ``(host_hash, boost)``
    DataFrame with EXACTLY the ntile-tier semantics of the tuple path —
    feed it to ``rank.attach_boosts(..., boosts_df=...)`` (or hang it on
    ``CrawlState.boosts_df``) instead of collecting a config tuple.

    Never collects and has no global window. The global ntile is
    decomposed as: (1) one broadcast 1-row aggregate carrying N and
    ``n_buckets-1`` percentile_approx boundaries of pr; (2) rows bucket by
    "how many boundaries ≥ my pr" — monotone in descending pr and
    tie-consistent, so every (pr) tie-group lands wholly in one bucket and
    bucket order extends the global (pr desc, host asc) order; (3)
    row_number per bucket (the only sort, ≈N/n_buckets rows per
    partition); (4) bucket sizes → running offsets (a bucket-cardinality
    window over ≤n_buckets rows, same metadata-aggregate class as the
    crawl path's 1-row crossJoins) broadcast back, giving the exact global
    rank; (5) the closed-form ntile tier from (rank, N, n_tiers). Digest
    equality with the tuple path is by construction, asserted at sandbox
    scale by tests/test_host_boosts.py.

    Hosts map to ``host_hash`` via Spark xxhash64 — the same function the
    scheduler keys on (ingest.py F2; ≡ xxh64.hash_str bit-for-bit).
    ``key="host"`` keeps the host string instead (the DuckDB oracle twin
    compares tiers on the string; DuckDB has no xxhash64)."""
    agg = ranks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.percentile_approx(
            "pr",
            [i / n_buckets for i in range(1, n_buckets)],
            1_000_000,
        ).alias("_bounds"),
    )
    b = ranks.crossJoin(F.broadcast(agg)).withColumn(
        "_bucket", F.expr("size(filter(_bounds, x -> x >= pr))")
    )
    wb = Window.partitionBy("_bucket").orderBy(
        F.col("pr").desc(), F.col("host").asc()
    )
    local = b.withColumn("_lr", F.row_number().over(wb))
    sizes = local.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_sz"))
    wo = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "_bucket", F.coalesce(F.sum("_sz").over(wo), F.lit(0)).alias("_off")
    )
    g = local.join(F.broadcast(offs), "_bucket").withColumn(
        "_rank", (F.col("_off") + F.col("_lr")).cast("long")
    )
    # exact SQL ntile in pure integer arithmetic (no double division — a
    # rank/(q+1) float would wobble past 2^53): the first (N % k) tiers
    # hold floor(N/k)+1 rows each; ceil(a/b) spelled (a+b-1) div b. The
    # ELSE branch is unreachable when N < k (q = 0), so its div-by-q is
    # never evaluated.
    k = int(n_tiers)
    tier = F.expr(
        f"CASE WHEN _rank <= (_n % {k}) * (_n div {k} + 1)"
        f" THEN (_rank + _n div {k}) div (_n div {k} + 1)"
        f" ELSE _n % {k} + (_rank - (_n % {k}) * (_n div {k} + 1)"
        f" + _n div {k} - 1) div (_n div {k}) END"
    )
    keycol = (
        F.xxhash64("host").alias("host_hash")
        if key == "host_hash"
        else F.col("host")
    )
    return g.select(keycol, (tier - n_tiers).cast("int").alias("boost"))


def anchor_stats(docs: DataFrame) -> DataFrame:
    """Per target host: inlink totals and the modal anchor text.

    Output: (dst_host, n_inlinks, n_src_hosts, n_anchors, top_anchor,
    top_anchor_n). ``top_anchor`` is the most frequent anchor string for
    the host, ties → lexicographically smallest (deterministic under any
    partitioning). Two aggregations over the exploded links — totals
    directly, modal anchor via a (dst_host, anchor) count + one window
    over the per-pair aggregate (pair-cardinality input, not corpus) —
    then a join on dst_host."""
    links = _link_spans(docs).select(
        "src_host", _dst_host().alias("dst_host"), "anchor"
    )
    totals = links.groupBy("dst_host").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("src_host").alias("n_src_hosts"),
        F.countDistinct("anchor").alias("n_anchors"),
    )
    pair = links.groupBy("dst_host", "anchor").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("dst_host").orderBy(
        F.col("cnt").desc(), F.col("anchor").asc()
    )
    top = (
        pair.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "dst_host",
            F.col("anchor").alias("top_anchor"),
            F.col("cnt").alias("top_anchor_n"),
        )
    )
    return totals.join(top, "dst_host")


def host_trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    n_iter: int = 4,
    damping: float = 0.85,
) -> DataFrame:
    """TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004) over the
    weighted host graph: PageRank with teleportation biased to a curated
    trusted-seed host set instead of uniform — trust flows OUT of seeds
    along links and decays with distance, so link-farm hosts that inflate
    plain PageRank through dense mutual linking get near-zero trust
    (no path from any seed reaches them). The scheduler consumes it like
    PageRank (``pagerank_boosts_df`` accepts any (host, score) frame);
    the pr/trust GAP is the classic spam-mass signal.

    t_{k+1}(v) = (1-d)·s(v) + d · Σ_{u→v} t_k(u)·w(u,v)/W_out(u), with
    s(v) = 1/|S| for seed hosts else 0, t_0 = s. ``seeds`` is any frame
    with a ``host`` column (production: a human-curated allowlist; the
    driver query derives a deterministic pseudo-seed set both engines can
    replay). Seeds absent from the graph are ignored (inner semi-join);
    |S| is computed INSIDE the plan (1-row broadcast aggregate) so
    construction stays lazy.

    Same scale/laziness discipline as ``host_pagerank``: fixed iteration
    count → ONE lazy Catalyst plan, no driver loop state; iterations run
    over the host-pair edge aggregate (≪ corpus); dangling hosts leak
    mass (standard simplification — ordering unaffected). Output rounded
    to 6 dp at the END only."""
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    seed_nodes = nodes.join(
        seeds.select("host").distinct(), "host", "semi"
    )
    n_s = seed_nodes.agg(F.count(F.lit(1)).cast("double").alias("n_seeds"))
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("w_out"))
    share = edges.join(out_w, "src_host").select(
        "src_host",
        "dst_host",
        (F.col("n_links").cast("double") / F.col("w_out")).alias("share"),
    )
    base = (
        nodes.join(seed_nodes.withColumn("_s", F.lit(1.0)), "host", "left")
        .crossJoin(F.broadcast(n_s))
        .select(
            "host",
            (F.coalesce(F.col("_s"), F.lit(0.0)) / F.col("n_seeds")).alias("s"),
        )
    )
    trust = base.select("host", "s", F.col("s").alias("t"))
    for _ in range(n_iter):
        contrib = (
            share.join(trust, share["src_host"] == trust["host"])
            .groupBy("dst_host")
            .agg(F.sum(F.col("t") * F.col("share")).alias("c"))
        )
        trust = (
            base.join(contrib, base["host"] == contrib["dst_host"], "left")
            .select(
                "host",
                "s",
                (
                    (1.0 - damping) * F.col("s")
                    + damping * F.coalesce(F.col("c"), F.lit(0.0))
                ).alias("t"),
            )
        )
    return trust.select("host", F.round("t", 6).alias("trust"))


def spam_mass(pr: DataFrame, trust: DataFrame) -> DataFrame:
    """Relative spam mass (Gyöngyi et al.): how much of a host's PageRank
    is NOT accounted for by seed-reachable trust. Inputs are the ROUNDED
    outputs of ``host_pagerank`` (host, pr) and ``host_trustrank``
    (host, trust) — composing the already-rounded values keeps the
    arithmetic bit-identical across engines. Trust is rescaled to
    PageRank's total mass (Σpr/Σtrust, two 1-row broadcast aggregates —
    the teleport vectors distribute different totals), then
    m(v) = (pr(v) − trust(v)·scale) / pr(v), rounded to 6 dp; pr has the
    (1-d)/N floor so the division is always defined. High m ≈ rank
    manufactured by link structure no trusted seed endorses — the
    demotion signal. One host-cardinality inner join; no new iteration."""
    sums = (
        pr.agg(F.sum("pr").alias("pr_sum"))
        .crossJoin(trust.agg(F.sum("trust").alias("t_sum")))
        .select((F.col("pr_sum") / F.col("t_sum")).alias("scale"))
    )
    return (
        pr.join(trust, "host")
        .crossJoin(F.broadcast(sums))
        .select(
            "host",
            "pr",
            "trust",
            F.round(
                (F.col("pr") - F.col("trust") * F.col("scale")) / F.col("pr"), 6
            ).alias("spam_mass"),
        )
    )


def trust_boosts_df(
    pr: DataFrame,
    trust: DataFrame,
    n_tiers: int = 4,
    spam_threshold: float = 0.5,
    n_buckets: int = 32,
    key: str = "host_hash",
) -> DataFrame:
    """Trust-ADJUSTED scheduler boosts — the composition step that makes
    the anti-spam family (host_trustrank / spam_mass) consumable by the
    crawl scheduler (VERDICT r6 directive #5): PageRank ntile tiers
    exactly as ``pagerank_boosts_df``, then hosts whose relative spam
    mass ≥ ``spam_threshold`` are CLAMPED to boost +n_tiers — boosts sort
    ascending (tier boosts are −n_tiers+1..0, unlisted hosts 0), so the
    positive clamp schedules a flagged host behind every organic tier AND
    behind unlisted hosts. A link farm can manufacture PageRank, but it
    cannot manufacture seed-reachable trust, so its tier-1 boost
    collapses to the back of the round.

    Feed the result to ``rank.attach_boosts(..., boosts_df=...)`` (or
    ``CrawlState.boosts_df``) exactly like the PageRank tiers; flag off
    (no boosts_df) stays bit-identical. tests/test_host_boosts.py proves
    schedule divergence on a planted link-farm clique against the same
    composition applied oracle-side.

    Scale shape: spam_mass is one host-cardinality join + two 1-row
    aggregates; the tier machinery is pagerank_boosts_df's decomposed
    ntile (no collect, no global window); the final clamp is one more
    host-cardinality keyed join. Nothing corpus-scale is broadcast —
    both sides of every join here are host-cardinality."""
    sm = spam_mass(pr, trust)
    tiers = pagerank_boosts_df(
        sm.select("host", "pr"), n_tiers=n_tiers, n_buckets=n_buckets, key=key
    )
    keycol = (
        F.xxhash64("host").alias(key) if key == "host_hash" else F.col("host")
    )
    flagged = sm.select(
        keycol, (F.col("spam_mass") >= F.lit(float(spam_threshold))).alias("_spam")
    )
    return tiers.join(flagged, key).select(
        key,
        F.when(F.col("_spam"), F.lit(int(n_tiers)))
        .otherwise(F.col("boost"))
        .cast("int")
        .alias("boost"),
    )


def host_hits(edges: DataFrame, n_iter: int = 4) -> DataFrame:
    """Kleinberg HITS over the weighted host graph:
    (src_host, dst_host, n_links) → (host, hub, auth).

    auth_k(v) = Σ_{u→v} w(u,v)·hub_{k-1}(u); hub_k(u) = Σ_{u→v}
    w(u,v)·auth_k(v). Iterations run UN-normalized and both vectors are
    L∞-normalized (divide by max — exact across engines, unlike an L2
    sqrt) once at the output: per-half-step normalization would
    reference each raw aggregate twice (norm + join), DOUBLING the
    Catalyst lineage every half-step — an exponential plan that OOMs
    the driver before a row moves. Un-normalized magnitudes are bounded
    by (Σw)^{2·n_iter}; at the fixed default depth that sits far inside
    double range even at 10^9 hosts, and the normalized RATIOS — the
    thing a scheduler consumes — are identical.

    Same scale/laziness discipline as ``host_pagerank``: fixed
    iteration count → ONE lazy plan, no driver loop state; every join
    keys on host strings over the host-pair edge aggregate (≪ corpus);
    hosts with no outlinks get hub 0, no inlinks → auth 0 (the final
    left joins onto the node set). Output rounded to 6 dp."""
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    # hub_0 ≡ 1 folds into the first half-step: auth_1(v) = Σ_{u→v} w
    auth = edges.groupBy("dst_host").agg(
        F.sum(F.col("n_links").cast("double")).alias("auth")
    )
    hub = None
    for k in range(n_iter):
        hub = (
            edges.join(auth, "dst_host")
            .groupBy("src_host")
            .agg(F.sum(F.col("n_links") * F.col("auth")).alias("hub"))
        )
        if k < n_iter - 1:
            auth = (
                edges.join(hub, "src_host")
                .groupBy("dst_host")
                .agg(F.sum(F.col("n_links") * F.col("hub")).alias("auth"))
            )
    a_max = auth.agg(F.max("auth").alias("a_max"))
    h_max = hub.agg(F.max("hub").alias("h_max"))
    return (
        nodes.join(hub.withColumnRenamed("src_host", "host"), "host", "left")
        .join(auth.withColumnRenamed("dst_host", "host"), "host", "left")
        .crossJoin(F.broadcast(a_max))
        .crossJoin(F.broadcast(h_max))
        .select(
            "host",
            F.round(
                F.coalesce(F.col("hub"), F.lit(0.0)) / F.col("h_max"), 6
            ).alias("hub"),
            F.round(
                F.coalesce(F.col("auth"), F.lit(0.0)) / F.col("a_max"), 6
            ).alias("auth"),
        )
    )


def host_opic(edges: DataFrame, n_iter: int = 4) -> DataFrame:
    """OPIC — Adaptive On-Line Page Importance Computation (Abiteboul,
    Preda, Cobena, WWW 2003; public literature) over the weighted host
    graph: (src_host, dst_host, n_links) → (host, cash, history, opic).

    The crawler-native importance estimator: every host starts with cash
    1/N; each synchronous step banks the host's cash into its history and
    redistributes it to out-neighbors proportionally to link weight.
    Hosts with NO out-edges pay their cash into the paper's virtual node,
    which redistributes it uniformly — so total cash stays exactly 1 and
    Σhistory after k steps is exactly k. The importance estimate is the
    paper's (history + cash) / (Σhistory + Σcash) = (history + cash) /
    (n_iter + 1). Unlike batch PageRank this needs no damping parameter
    and, run online, keeps improving as the crawl proceeds — here it is
    the fixed-iteration batch form so the DuckDB oracle can unroll the
    IDENTICAL steps as a CTE chain (the host_pagerank convention:
    deterministic, no convergence races across engines).

    Scale shape mirrors host_pagerank: the corpus reduces to the
    host-pair edge aggregate once (host_edges); each step is one keyed
    join + one keyed aggregate over edge/host-cardinality frames plus a
    1-row dangling-cash aggregate (broadcast, metadata class); fixed
    iteration count → ONE lazy plan, no driver loop state; nothing
    corpus-scale is broadcast. Output rounded to 6 dp.

    Scheduler hand-off: ``pagerank_boosts_df(opic.select("host",
    F.col("opic").alias("pr")))`` quantizes OPIC scores into the same
    (host_hash, boost) tiers the crawl loop consumes via
    ``rank.attach_boosts(..., boosts_df=...)`` — the boosts seam is
    score-agnostic."""
    nodes = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
    )
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    out_w = edges.groupBy("src_host").agg(F.sum("n_links").alias("w_out"))
    share = edges.join(out_w, "src_host").select(
        "src_host",
        "dst_host",
        (F.col("n_links").cast("double") / F.col("w_out")).alias("share"),
    )
    base = nodes.crossJoin(F.broadcast(n1))  # (host, n_nodes)
    state = base.select(
        "host",
        "n_nodes",
        (F.lit(1.0) / F.col("n_nodes")).alias("cash"),
        F.lit(0.0).alias("history"),
    )
    linked = out_w.select(F.col("src_host").alias("host"))
    for _ in range(n_iter):
        contrib = (
            share.join(
                state.select(F.col("host").alias("src_host"), "cash"), "src_host"
            )
            .groupBy("dst_host")
            .agg(F.sum(F.col("cash") * F.col("share")).alias("c_in"))
        )
        dangling = state.join(linked, "host", "left_anti").agg(
            F.coalesce(F.sum("cash"), F.lit(0.0)).alias("d_cash")
        )
        state = (
            state.join(
                contrib.withColumnRenamed("dst_host", "host"), "host", "left"
            )
            .crossJoin(F.broadcast(dangling))
            .select(
                "host",
                "n_nodes",
                (
                    F.coalesce(F.col("c_in"), F.lit(0.0))
                    + F.col("d_cash") / F.col("n_nodes")
                ).alias("cash"),
                (F.col("history") + F.col("cash")).alias("history"),
            )
        )
    total = float(n_iter) + 1.0
    return state.select(
        "host",
        F.round("cash", 6).alias("cash"),
        F.round("history", 6).alias("history"),
        F.round((F.col("history") + F.col("cash")) / F.lit(total), 6).alias("opic"),
    )
