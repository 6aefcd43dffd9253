"""Distributed connected components over a pair list — the clustering step
a training-data dedup pipeline runs AFTER near-dup pair finding (LSH /
embedding tiers emit PAIRS; deduplication needs CLUSTERS and one canonical
representative per cluster).

Algorithm: iterative min-label propagation expressed as DataFrame joins —
each iteration every node adopts the minimum label among itself and its
neighbors, then labels are SHORTCUT through the label graph (lbl :=
lbl(lbl), the pointer-jumping step of the classic MapReduce CC family —
cf. Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — public literature). Plain propagation alone needs O(diameter)
rounds; the shortcut step makes label distances collapse geometrically, so
convergence is O(log diameter) — a path graph of diameter ~2^max_iter
converges within max_iter iterations, removing the silent-truncation
hazard a deep transitive near-dup chain (A~B~C~…, easy to produce at
100 TB with chained paraphrases) would otherwise hit. Convergence is
still CHECKED (no label changed; one count aggregate per iteration), and
exhausting max_iter without converging RAISES instead of returning wrong
partial labels.

Scale notes:
- each iteration is two shuffle joins keyed on node/label id plus a
  map-side-combined min-aggregate — no driver-side adjacency, no collect;
- lineage is truncated with localCheckpoint every `checkpoint_every`
  iterations so the plan does not grow with iteration count;
- labels start as node ids and only ever decrease, so the converged label
  IS the minimum node id of the component — making `component` double as
  the canonical-representative id (is_rep = node == component);
- the returned DataFrame is eagerly localCheckpoint-ed and every interior
  persist is released before returning, so repeated calls (e.g. per-round
  dedup) do not accumulate cached blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, component) for every node appearing in `edges`; component =
    min node id of the connected component. Raises RuntimeError if labels
    have not converged after max_iter iterations (with the shortcut step
    that needs a component diameter around 2^max_iter — unreachable for
    any real dedup graph, so a raise means the input or iteration budget
    is pathological, never a silently wrong clustering)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (
        sym.unionByName(sym.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    converged = False
    for i in range(max_iter):
        prop = sym.join(
            labels.select(F.col("node").alias("b"), "lbl"), "b"
        ).select(F.col("a").alias("node"), "lbl")
        mins = (
            labels.unionByName(prop).groupBy("node").agg(F.min("lbl").alias("lbl"))
        )
        # shortcut (pointer jumping): every label is itself a node id whose
        # own label only ever decreases — jumping to it halves the label
        # distance to the component minimum each iteration
        new_labels = (
            mins.alias("x")
            .join(
                mins.select(
                    F.col("node").alias("lbl"), F.col("lbl").alias("lbl2")
                ).alias("y"),
                "lbl",
                "left",
            )
            .select("node", F.least("lbl", F.coalesce("lbl2", "lbl")).alias("lbl"))
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        changed = (
            new_labels.join(
                labels.select("node", F.col("lbl").alias("_old")), "node"
            )
            .filter(F.col("lbl") != F.col("_old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            "iterations — refusing to return partial (wrong) cluster labels"
        )
    out = labels.select("node", F.col("lbl").alias("component")).localCheckpoint(
        eager=True
    )
    labels.unpersist()
    return out


def dedup_clusters(pairs: DataFrame, a: str = "vec_a", b: str = "vec_b") -> DataFrame:
    """Near-dup PAIRS → per-node cluster assignment with the canonical
    representative flagged: (vec_id, cluster_id, is_rep). Keep is_rep rows,
    drop the rest — the actual dedup action over LSH/embedding pair output."""
    cc = connected_components(pairs, src=a, dst=b)
    return cc.select(
        F.col("node").alias("vec_id"),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_rep"),
    )


def redirect_resolve(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 8,
) -> DataFrame:
    """Resolve HTTP-redirect chains to their final target — (url,
    final_url, n_hops, status) for every redirecting URL. The alias map a
    crawler needs after a round of 3xx responses: every chain member maps
    to one canonical final URL, so duplicate content fetched via different
    entry points collapses before dedup/frontier update.

    Semantics match production crawler policy (curl/Googlebot-style hop
    cap, no unbounded loop chasing): a chain that reaches a non-redirecting
    terminal within ``max_hops`` hops is ``resolved`` with its exact hop
    count; anything else — a longer chain or a redirect loop — is
    ``unresolved`` with final_url NULL and n_hops = max_hops. A terminal is
    any target that never appears as a redirect source. Duplicate
    observations of one source are collapsed deterministically to the
    minimum target before walking (one out-edge per URL — a functional
    graph).

    Algorithm: path doubling (the pointer-jumping trick of
    ``connected_components`` applied to a functional graph) — state rows
    (url, cur, hops, done) compose with themselves, doubling resolved path
    length each iteration, so ``log2(max_hops)`` self-join shuffles cover
    the full hop budget: 3 shuffles for the default 8, never O(chain
    length) rounds. ``max_hops`` must be a power of two so "not done after
    the last doubling" is exactly "needs > max_hops hops".

    Scale shape: state stays one row per redirect source; each iteration
    is one shuffle join keyed on the current-target URL plus the initial
    terminal-detection left join — nothing corpus-derived is broadcast or
    collected."""
    if max_hops < 1 or (max_hops & (max_hops - 1)) != 0:
        raise ValueError(f"max_hops must be a power of two, got {max_hops}")
    e = (
        edges.select(F.col(src).alias("url"), F.col(dst).alias("nxt"))
        .groupBy("url")
        .agg(F.min("nxt").alias("cur"))
    )
    is_src = e.select(F.col("url").alias("cur")).withColumn("_issrc", F.lit(True))
    state = (
        e.join(is_src, "cur", "left")
        .select(
            "url",
            "cur",
            F.lit(1).cast("long").alias("hops"),
            F.col("_issrc").isNull().alias("done"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for _ in range(max_hops.bit_length() - 1):
        m = state.select(
            F.col("url").alias("cur"),
            F.col("cur").alias("m_cur"),
            F.col("hops").alias("m_hops"),
            F.col("done").alias("m_done"),
        )
        # done rows keep a terminal `cur` (never a source), so their lookup
        # misses and the left join passes them through unchanged; non-done
        # rows' cur is always a source, so their lookup always hits
        new_state = (
            state.join(m, "cur", "left")
            .select(
                "url",
                F.when(F.col("done"), F.col("cur")).otherwise(F.col("m_cur")).alias("cur"),
                F.when(F.col("done"), F.col("hops"))
                .otherwise(F.col("hops") + F.col("m_hops"))
                .alias("hops"),
                F.when(F.col("done"), F.lit(True)).otherwise(F.col("m_done")).alias("done"),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        state.unpersist()
        state = new_state
    out = state.select(
        "url",
        F.when(F.col("done"), F.col("cur")).alias("final_url"),
        F.when(F.col("done"), F.col("hops"))
        .otherwise(F.lit(max_hops))
        .cast("long")
        .alias("n_hops"),
        F.when(F.col("done"), F.lit("resolved")).otherwise(F.lit("unresolved")).alias("status"),
    ).localCheckpoint(eager=True)
    state.unpersist()
    return out
