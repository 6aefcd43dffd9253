"""LSH band blowup guard (VERDICT r01 item 7): a mega-cluster of exact
duplicates must not emit O(N²) pairs, and capped bands are counted, never
silently dropped."""

from pyspark.sql import functions as F

from crawlspark import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dup_megacluster_is_collapsed(spark):
    """200 identical docs + 3 distinct near-dup variants: without the rep
    collapse this emits ~19,900 intra-cluster pairs; with it, the cluster
    contributes a single representative."""
    mega = [(i, "the same exact words repeated in this document body") for i in range(200)]
    near = [
        (1000, "the same exact words repeated in this document frame"),
        (1001, "a completely different text about unrelated topics entirely"),
    ]
    df = _docs(spark, mega + near)
    pairs = textops.lsh_candidate_pairs(df).collect()
    assert len(pairs) <= 4, pairs  # rep + near-dup variants only, no N² blowup
    for p in pairs:
        assert not (0 < p["doc_a"] < 200 and p["doc_b"] < 200), "intra-cluster pair leaked"
    # exact_dedup still reports the full cluster membership
    ed = {r["rep_doc_id"]: r["n_copies"] for r in textops.exact_dedup(df).collect()}
    assert ed[0] == 200


def test_band_cap_excludes_and_counts(spark):
    """With band_cap=1 every multi-doc band is excluded -> zero pairs, and
    lsh_band_stats reports exactly those exclusions (no silent truncation)."""
    rows = [(i, f"shared prefix words here tail_{i}") for i in range(10)]
    df = _docs(spark, rows)
    uncapped = textops.lsh_candidate_pairs(df, band_cap=10_000).count()
    capped = textops.lsh_candidate_pairs(df, band_cap=1).count()
    assert capped == 0 and uncapped >= 0
    stats = textops.lsh_band_stats(df, band_cap=1).collect()[0]
    sizes = (
        textops._banded(textops._dedup_reps(df), textops.MINHASH_K, textops.LSH_BANDS)
        .groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected_oversized = sum(1 for r in sizes if r["n"] > 1)
    assert stats["oversized_bands"] == expected_oversized
    assert stats["n_bands"] == len(sizes)
    assert stats["max_band_size"] == max(r["n"] for r in sizes)
