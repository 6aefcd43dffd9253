"""SimHash Hamming-band near-dup pairs (Manku et al., WWW 2007 —
textops.simhash_pairs): pigeonhole exactness vs a brute-force control,
the exact-dup mega-cluster guard, the band-cap audit contract, and the
no-corpus-broadcast plan shape."""

import itertools

from pyspark.sql import functions as F

from crawlspark import textops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_VOCAB = [
    "row", "scan", "table", "hash", "join", "sort", "agg", "part",
    "key", "value", "batch", "filter",
]


def _synth_rows(n=40, words=30):
    """Deterministic small-vocabulary corpus: i.i.d.-looking word draws
    from an arithmetic rule, so naturally-close fingerprints occur."""
    rows = []
    for i in range(n):
        ws = [_VOCAB[(i * 7 + j * 5 + (i * j) % 11) % len(_VOCAB)] for j in range(words)]
        rows.append((i, " ".join(ws)))
    return rows


def test_simhash_pairs_exact_vs_bruteforce(spark):
    """The pigeonhole guarantee end-to-end: with 4 bands and k=3, the
    banded pairs + Hamming verify must equal the BRUTE-FORCE all-pairs
    Hamming ≤ 3 set over the distinct-text representatives — zero false
    negatives (pigeonhole) and zero false positives (the verify)."""
    rows = _synth_rows()
    # one-word-append derivatives: near dups at small Hamming distance
    derived = [(i + 1000, t + " the") for i, t in rows if i % 8 == 3]
    df = _docs(spark, rows + derived)
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in textops.simhash_pairs(df, band_cap=10_000).collect()
    }
    fps = {
        r.doc_id: r.simhash
        for r in textops.simhash(textops._dedup_reps(df)).collect()
    }
    want = {}
    for a, b in itertools.combinations(sorted(fps), 2):
        h = bin(fps[a] ^ fps[b]).count("1")
        if h <= textops.SIMHASH_MAX_HAMMING:
            want[(a, b)] = h
    assert want, "vacuous draw: no brute-force pair within the bound"
    assert got == want


def test_simhash_pairs_collapses_exact_dups(spark):
    """200 identical docs must contribute ONE representative — no O(N²)
    intra-cluster pairs (the _dedup_reps guard, same as LSH)."""
    body = ("the same exact words repeated in this document body " * 5).strip()
    mega = [(i, body) for i in range(200)]
    near = [(1000, body + " the")]
    pairs = textops.simhash_pairs(_docs(spark, mega + near), band_cap=10_000).collect()
    assert len(pairs) == 1
    assert (pairs[0].doc_a, pairs[0].doc_b) == (0, 1000)
    assert pairs[0].hamming <= textops.SIMHASH_MAX_HAMMING


def test_simhash_band_cap_excludes_and_counts(spark):
    """band_cap=1 excludes every multi-doc bucket → zero pairs, and the
    stats op reports exactly those exclusions (no silent truncation)."""
    rows = _synth_rows(n=12)
    derived = [(i + 1000, t + " the") for i, t in rows if i % 4 == 1]
    df = _docs(spark, rows + derived)
    assert textops.simhash_pairs(df, band_cap=10_000).count() > 0
    assert textops.simhash_pairs(df, band_cap=1).count() == 0
    stats = textops.simhash_band_stats(df, band_cap=1).collect()[0]
    sizes = (
        textops._simhash_banded(df, textops.SIMHASH_BITS, textops.SIMHASH_BANDS)
        .groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert stats.oversized_bands == sum(1 for r in sizes if r.n > 1)
    assert stats.n_bands == len(sizes)
    assert stats.max_band_size == max(r.n for r in sizes)


def test_simhash_pairs_rejects_vacuous_band_count(spark):
    """bands ≤ max_hamming voids the pigeonhole no-false-negative
    guarantee — refused loudly, never a silently-lossy run."""
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        textops.simhash_pairs(_docs(spark, _synth_rows(n=4)), bands=3)


def test_simhash_pairs_no_corpus_broadcast(spark):
    """Scale shape: the bucket-size set and both self-join sides are
    corpus-derived → must arrive over SHUFFLE joins (never broadcast,
    the VERDICT r4 executor-OOM class)."""
    df = textops.simhash_pairs(_docs(spark, _synth_rows(n=16)))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan
