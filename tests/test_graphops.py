"""Connected-components near-dup clustering (crawlspark/graphops.py):
known-graph correctness, convergence past checkpoint boundaries, and the
planted-pair property on the embeddings fixture."""

from pyspark.sql import functions as F

from crawlspark import graphops


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = graphops.connected_components(df, **kw).collect()
    return {r["node"]: r["component"] for r in rows}


def test_cc_basic_shapes(spark):
    # two chains + a triangle + an isolated pair
    got = _cc(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (22, 20), (30, 31)],
    )
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
        30: 30, 31: 30,
    }


def test_cc_deep_chain_crosses_checkpoints(spark):
    """A 20-node chain needs ~19 propagation rounds — convergence must
    survive the localCheckpoint lineage truncation every 3 iterations."""
    edges = [(i, i + 1) for i in range(100, 119)]
    got = _cc(spark, edges, checkpoint_every=3, max_iter=30)
    assert set(got.values()) == {100}
    assert len(got) == 20


def test_dedup_clusters_representatives(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 12), (40, 41)], "vec_a long, vec_b long"
    )
    rows = graphops.dedup_clusters(pairs).collect()
    by_id = {r["vec_id"]: (r["cluster_id"], r["is_rep"]) for r in rows}
    assert by_id == {
        5: (5, True), 9: (5, False), 12: (5, False),
        40: (40, True), 41: (40, False),
    }
    # exactly one representative per cluster
    reps = [r for r in rows if r["is_rep"]]
    assert {r["cluster_id"] for r in reps} == {5, 40}


def test_planted_neardups_cluster_together(spark):
    """Every planted id-shifted duplicate must land in its original's
    cluster with the original as representative (min id)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    from crawlspark import simsearch

    planted = emb.filter(F.col("vec_id") % 97 == 0).select(
        (F.col("vec_id") + F.lit(10000000)).alias("vec_id"), "embedding"
    )
    pairs = simsearch.embedding_neardup_pairs(emb.unionByName(planted))
    rows = graphops.dedup_clusters(pairs).collect()
    by_id = {r["vec_id"]: r["cluster_id"] for r in rows}
    originals = [r["vec_id"] for r in emb.filter(F.col("vec_id") % 97 == 0).collect()]
    assert originals, "fixture has no planted base ids"
    for v in originals:
        assert by_id.get(v + 10000000) == by_id.get(v) == v


def test_cc_pathological_diameter_converges_fast(spark):
    """A 200-node path (diameter 199 >> max_iter=25) must still converge:
    the pointer-jumping shortcut collapses label distance geometrically, so
    O(log diameter) iterations suffice — the scenario that previously
    returned silently WRONG split labels past the iteration cap."""
    edges = [(i, i + 1) for i in range(1000, 1199)]
    got = _cc(spark, edges, max_iter=25)
    assert set(got.values()) == {1000}
    assert len(got) == 200


def test_cc_raises_on_exhausted_iterations(spark):
    """If the budget genuinely cannot converge, the call must RAISE — never
    return partial labels (they would be wrong cluster assignments)."""
    import pytest

    edges = [(i, i + 1) for i in range(0, 30)]
    df = spark.createDataFrame(edges, "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graphops.connected_components(df, max_iter=1)


def test_cc_releases_cached_blocks(spark):
    """Repeated calls must not accumulate persisted blocks (the result is
    localCheckpoint-materialized; interior persists are released)."""
    before = len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    for _ in range(3):
        df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        graphops.connected_components(df).collect()
    after = len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    # localCheckpoint RDDs of the 3 results may linger until GC; persisted
    # iteration intermediates must not (bounded, not linear in iterations)
    assert after - before <= 3


# ---------------------------------------------------------------------------
# redirect_resolve (path-doubling 3xx chain resolution)
# ---------------------------------------------------------------------------


def _rr(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = graphops.redirect_resolve(df, **kw).collect()
    return {r["url"]: (r["final_url"], r["n_hops"], r["status"]) for r in rows}


def test_redirect_chain_resolves_with_exact_hops(spark):
    got = _rr(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {
        "a": ("d", 3, "resolved"),
        "b": ("d", 2, "resolved"),
        "c": ("d", 1, "resolved"),
    }


def test_redirect_loop_is_unresolved(spark):
    got = _rr(spark, [("x", "y"), ("y", "z"), ("z", "x"), ("a", "x")])
    assert got == {
        "x": (None, 8, "unresolved"),
        "y": (None, 8, "unresolved"),
        "z": (None, 8, "unresolved"),
        "a": (None, 8, "unresolved"),  # feeds INTO a loop
    }


def test_redirect_hop_cap_boundary(spark):
    """Chain of exactly max_hops resolves; one longer does not."""
    chain = [(f"n{i}", f"n{i+1}") for i in range(9)]  # n0 -> ... -> n9
    got = _rr(spark, chain, max_hops=8)
    assert got["n1"] == ("n9", 8, "resolved")  # exactly 8 hops
    assert got["n0"] == (None, 8, "unresolved")  # 9 hops: past the cap
    assert got["n2"] == ("n9", 7, "resolved")


def test_redirect_aliases_collapse_to_one_final(spark):
    """Multiple entry points into one chain map to the same final URL —
    the alias-collapse property dedup needs."""
    got = _rr(spark, [("m1", "t"), ("m2", "t"), ("m3", "m1")])
    finals = {v[0] for v in got.values()}
    assert finals == {"t"}


def test_redirect_duplicate_observations_deterministic(spark):
    """Repeated/conflicting observations of one source collapse to the
    minimum target before walking."""
    got = _rr(spark, [("a", "c"), ("a", "b")])
    assert got["a"] == ("b", 1, "resolved")


def test_redirect_max_hops_must_be_power_of_two(spark):
    import pytest

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="power of two"):
        graphops.redirect_resolve(df, max_hops=6)
