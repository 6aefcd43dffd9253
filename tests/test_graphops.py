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
