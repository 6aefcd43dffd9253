"""Exact two-pass heavy hitters (textops.mg_candidates /
textops.heavy_hitters): the Misra–Gries candidate guarantee (every true
φ-heavy hitter survives pass 1 under ANY partitioning), real pruning
(the candidate set stays sketch-sized, not vocab-sized), exactness of
the final output vs a Python Counter, and parallelism invariance of the
exact output while the intermediate candidate set varies."""

from collections import Counter

from pyspark.sql import functions as F

from crawlspark import textops

PHI = 0.01


def _corpus(spark):
    # deterministic zipf-ish corpus: token t_i appears ~N/i times for the
    # head, plus a long tail of singletons (the part MG must NOT keep)
    rows = []
    doc = 0
    for i in range(1, 21):  # head: t1..t20
        for j in range(2000 // i):
            rows.append((f"d{doc}", f"t{i}"))
            doc += 1
    for i in range(3000):  # tail singletons
        rows.append((f"d{doc}", f"tail{i}"))
        doc += 1
    # one doc per token keeps the words_col path trivial and exact
    return spark.createDataFrame(rows, "doc_id string, text string")


def _truth(spark):
    docs = _corpus(spark)
    toks = [r["text"] for r in docs.collect()]
    c = Counter(toks)
    n = sum(c.values())
    hh = {t: k for t, k in c.items() if k > PHI * n}
    return docs, c, n, hh


def test_mg_guarantee_and_pruning(spark):
    docs, c, n, hh = _truth(spark)
    k = 2 * int(1 / PHI)
    for parts in (1, 7, 32):
        tokens = docs.repartition(parts).select(
            F.explode(textops.words_col()).alias("token")
        )
        cands = {
            r["token"] for r in textops.mg_candidates(tokens, k).collect()
        }
        # guarantee: every true heavy hitter is a candidate
        assert set(hh) <= cands, parts
        # bounded summary: <= k per partition
        assert len(cands) <= k * parts
        # non-vacuity: whenever the k·P budget is below the vocabulary,
        # the sketch must actually have pruned (at higher P the summaries
        # legitimately hold everything — the BOUND above still binds)
        if k * parts < len(c):
            assert len(cands) < len(c)


def test_heavy_hitters_exact_and_invariant(spark):
    docs, c, n, hh = _truth(spark)
    got = {
        r["token"]: (r["cnt"], r["frac"])
        for r in textops.heavy_hitters(docs, phi=PHI).collect()
    }
    assert {t: cnt for t, (cnt, _) in got.items()} == hh
    for t, (cnt, frac) in got.items():
        assert frac == round(cnt / n, 6)
    # invariance: same exact output at a different parallelism, even
    # though the pass-1 candidate sets differ
    got13 = {
        r["token"]: (r["cnt"], r["frac"])
        for r in textops.heavy_hitters(docs.repartition(13), phi=PHI).collect()
    }
    assert got == got13


def test_heavy_hitters_forced_shuffle_path(spark):
    # broadcast_candidates=False exercises the web-scale un-hinted
    # semi-join; output must be identical
    docs, _, _, hh = _truth(spark)
    got = {
        r["token"]: r["cnt"]
        for r in textops.heavy_hitters(
            docs, phi=PHI, broadcast_candidates=False
        ).collect()
    }
    assert got == hh
