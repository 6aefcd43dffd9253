"""Pipeline-curation operators (crawlspark/textops.py R4 additions):
benchmark decontamination and deterministic stratified sampling —
value-level vs DuckDB on the same parquet, plan-shape assertions
(broadcast on the bench side, no corpus-wide pre-distinct), and
parallelism-invariance of the hash sample."""

import duckdb
import pytest
from pyspark.sql import functions as F

from crawlspark import textops

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def test_decontaminate_matches_duckdb(spark, docs):
    bench = docs.filter(F.col("doc_id") % 89 == 0)
    train = docs.filter(F.col("doc_id") % 89 != 0)
    got = sorted(
        (r["doc_id"], r["n_hit_shingles"])
        for r in textops.decontaminate(train, bench).collect()
    )
    exp = sorted(
        _duck(
            """
            WITH w AS (SELECT doc_id,
                       list_filter(string_split(lower(text), ' '),
                                   x -> x <> '') AS ws FROM documents),
            s AS (SELECT doc_id, CASE WHEN len(ws) >= 3 THEN
                    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                     for i in generate_series(1, len(ws) - 2)]
                  ELSE []::VARCHAR[] END AS sh FROM w),
            e AS (SELECT doc_id, unnest(sh) AS shingle FROM s),
            hh AS (SELECT doc_id, md5(shingle) AS h FROM e),
            b AS (SELECT DISTINCT h FROM hh WHERE doc_id % 89 = 0),
            t AS (SELECT doc_id, h FROM hh WHERE doc_id % 89 <> 0)
            SELECT t.doc_id, COUNT(DISTINCT t.h) FROM t JOIN b USING (h)
            GROUP BY t.doc_id
            """
        )
    )
    assert got == exp
    assert got, "decontamination found nothing — vacuous fixture"


def test_decontaminate_plan_broadcasts_bench_side(spark, docs):
    bench = docs.filter(F.col("doc_id") % 89 == 0)
    train = docs.filter(F.col("doc_id") % 89 != 0)
    plan = textops.decontaminate(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the training side must flow scan → explode → join with NO shuffle
    # before the join (a corpus-wide pre-distinct would Exchange the whole
    # corpus): in the plan tree the join's streamed branch is the lines
    # prefixed with ':' between the join node and its BroadcastExchange
    # sibling — no Exchange may appear there
    join_at = plan.index("BroadcastHashJoin")
    streamed = [
        ln
        for ln in plan[join_at:].splitlines()[1:]
        if ln.lstrip().startswith(":")
    ]
    assert streamed and not any("Exchange" in ln for ln in streamed), streamed


def test_hash_sample_matches_duckdb_and_is_deterministic(spark, docs):
    cutoffs = {"src0": 256, "src1": 192, "src2": 128, "src3": 64}
    got = sorted(
        (r["doc_id"], r["source"])
        for r in textops.hash_sample(docs, cutoffs, default=32).collect()
    )
    exp = sorted(
        _duck(
            """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     substr(md5(CAST(doc_id AS VARCHAR) || '#smp'), 1, 2) AS b2
              FROM documents)
            WHERE b2 < CASE source
              WHEN 'src0' THEN 'zz' WHEN 'src1' THEN 'c0'
              WHEN 'src2' THEN '80' WHEN 'src3' THEN '40' ELSE '20' END
            """
        )
    )
    assert got == exp
    assert got, "sample is empty — vacuous"
    # repartitioning must not change membership (pure function of doc_id)
    got2 = sorted(
        (r["doc_id"], r["source"])
        for r in textops.hash_sample(docs.repartition(7), cutoffs, default=32).collect()
    )
    assert got2 == got


def test_hash_sample_rates_track_cutoffs(spark, docs):
    """src0 keeps everything; lower cutoffs keep monotonically less (in
    expectation — asserted loosely at fixture scale)."""
    cutoffs = {"src0": 256, "src1": 128}
    sampled = textops.hash_sample(docs, cutoffs, default=0).groupBy("source").count()
    by_src = {r["source"]: r["count"] for r in sampled.collect()}
    total = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    assert by_src.get("src0", 0) == total["src0"]          # cutoff 256 = all
    assert 0 < by_src.get("src1", 0) < total["src1"]       # strict subsample
    assert set(by_src) <= {"src0", "src1"}                 # default 0 = none


def test_repetition_stats_matches_duckdb(spark, docs):
    got = sorted(tuple(r) for r in textops.repetition_stats(docs).collect())
    exp = sorted(
        _duck(
            """
            WITH w AS (SELECT doc_id,
                       list_filter(string_split(lower(text), ' '),
                                   x -> x <> '') AS ws FROM documents),
            g AS (SELECT doc_id, len(ws) AS n_words,
                         CASE WHEN len(ws) >= 2 THEN
                           [ws[i] || ' ' || ws[i+1]
                            for i in generate_series(1, len(ws) - 1)]
                         ELSE []::VARCHAR[] END AS tg FROM w),
            base AS (SELECT doc_id, n_words, len(tg) AS n_2grams,
                            len(tg) - len(list_distinct(tg)) AS n_dup
                     FROM g),
            e AS (SELECT doc_id, unnest(ws) AS word FROM w),
            tc AS (SELECT doc_id, CAST(MAX(c) AS BIGINT) AS twc
                   FROM (SELECT doc_id, word, COUNT(*) AS c FROM e
                         GROUP BY doc_id, word) GROUP BY doc_id)
            SELECT b.doc_id, b.n_2grams, b.n_dup,
                   round(CASE WHEN b.n_2grams > 0
                         THEN CAST(b.n_dup AS DOUBLE) / b.n_2grams
                         ELSE 0.0 END, 6),
                   COALESCE(tc.twc, 0),
                   round(CASE WHEN b.n_words > 0
                         THEN CAST(COALESCE(tc.twc, 0) AS DOUBLE) / b.n_words
                         ELSE 0.0 END, 6)
            FROM base b LEFT JOIN tc ON tc.doc_id = b.doc_id
            """
        )
    )
    assert got == exp
    assert any(r[2] > 0 for r in got), "no doc has duplicate 2-grams — vacuous"


# ---------------------------------------------------------------------------
# R4b additions: PII scrub, boilerplate line removal, corpus mix
# ---------------------------------------------------------------------------

def test_pii_scrub_counts_and_redaction(spark):
    rows = [
        (1, "write to alice.smith+news@sub.example.org today"),
        (2, "server at 192.168.1.100 and backup 10.0.0.7"),
        (3, "call 555-0100-42 or 31 22 44 55 66"),
        (4, "no pii here at all"),
        (5, "two mails a@b.co and c.d@e-f.io plus ip 8.8.8.8"),
        # cross-class overlap: the long digit run lives INSIDE the email
        # local part — progressive counting attributes it to the email
        # class only (counted once, on the text that still contains it)
        (6, "mail 12345678@x.com now"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r.asDict() for r in textops.pii_scrub(df).collect()}
    assert got[6]["n_emails"] == 1 and got[6]["n_longnums"] == 0
    import hashlib as _h

    assert got[6]["clean_md5"] == _h.md5(b"mail <EMAIL> now").hexdigest()
    assert got[1]["n_emails"] == 1 and got[1]["n_ipv4"] == 0
    assert got[2]["n_ipv4"] == 2 and got[2]["n_emails"] == 0
    assert got[3]["n_longnums"] == 2  # dashed + spaced digit runs
    assert got[4] == {
        "doc_id": 4, "n_emails": 0, "n_ipv4": 0, "n_longnums": 0,
        "clean_md5": got[4]["clean_md5"],
    }
    assert got[5]["n_emails"] == 2 and got[5]["n_ipv4"] == 1
    # redaction actually removed the PII bytes: md5 of the expected
    # redacted strings, computed independently
    import hashlib

    exp1 = hashlib.md5(b"write to <EMAIL> today").hexdigest()
    exp2 = hashlib.md5(b"server at <IP> and backup <IP>").hexdigest()
    exp3 = hashlib.md5(b"call <NUM> or <NUM>").hexdigest()
    assert got[1]["clean_md5"] == exp1
    assert got[2]["clean_md5"] == exp2
    assert got[3]["clean_md5"] == exp3


def test_line_dedup_drops_common_keeps_rare(spark):
    boiler = "subscribe now"
    rows = []
    for i in range(10):
        rows.append((i, f"unique line {i}\n{boiler}" + ("\nrare" if i == 0 else "")))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in textops.line_dedup(df, min_df=3).collect()}
    # boiler appears in 10 docs -> dropped everywhere; unique+rare kept
    assert out[0]["n_lines"] == 3 and out[0]["n_kept"] == 2
    for i in range(1, 10):
        assert out[i]["n_lines"] == 2 and out[i]["n_kept"] == 1
    import hashlib

    assert out[0]["clean_md5"] == hashlib.md5(b"unique line 0\nrare").hexdigest()
    # a doc that is ALL boilerplate survives with md5('')
    df2 = spark.createDataFrame(
        [(i, boiler) for i in range(5)], "doc_id bigint, text string"
    )
    out2 = textops.line_dedup(df2, min_df=3).collect()
    assert all(r["n_kept"] == 0 for r in out2)
    assert all(r["clean_md5"] == hashlib.md5(b"").hexdigest() for r in out2)


def test_line_dedup_preserves_intra_doc_order(spark):
    # kept lines must rejoin in ORIGINAL position order even when the
    # collect_list arrives shuffled — array_sort on (pos, line) structs
    text = "\n".join(f"l{i:03d}" for i in range(50))
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string").repartition(8)
    out = textops.line_dedup(df, min_df=2).collect()[0]
    import hashlib

    assert out["n_kept"] == 50
    assert out["clean_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_corpus_derived_broadcast_gate_paths_equal(spark, docs):
    """The size gate on corpus-derived small sides (line_dedup common-line
    set, unigram_logprob pruned vocab) must be plan-only: forced-broadcast,
    forced-shuffle, and both auto outcomes (measured-small via the default
    cap, measured-large via cap=0) all produce identical rows."""

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    variants = [
        textops.line_dedup(docs, min_df=2, broadcast_common=True),
        textops.line_dedup(docs, min_df=2, broadcast_common=False),
        textops.line_dedup(docs, min_df=2),  # auto -> measures small
        textops.line_dedup(docs, min_df=2, broadcast_max_rows=0),  # auto -> large
    ]
    base = rows(variants[0])
    assert all(rows(v) == base for v in variants[1:])

    uvariants = [
        textops.unigram_logprob(docs, broadcast_vocab=True),
        textops.unigram_logprob(docs, broadcast_vocab=False),
        textops.unigram_logprob(docs),
        textops.unigram_logprob(docs, broadcast_max_rows=0),
    ]
    ubase = rows(uvariants[0])
    assert all(rows(v) == ubase for v in uvariants[1:])


def test_corpus_mix_shares_sum_to_one(spark, docs):
    out = textops.corpus_mix(docs).collect()
    assert len(out) == docs.select("source").distinct().count()
    total = sum(r["token_share"] for r in out)
    assert abs(total - 1.0) < 1e-4
    assert all(r["n_docs"] > 0 and r["n_tokens"] > 0 for r in out)


def test_token_shards_matches_global_prefix_sum(spark, docs):
    """The bucketed two-pass prefix sum must equal the naive global
    cumulative sum exactly, at any parallelism and bucket width."""
    out = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"], r["shard_id"])
        for r in textops.token_shards(docs, budget=500, bucket_width=7).collect()
    }
    rows = sorted(
        (r["doc_id"], r["n"])
        for r in docs.select(
            "doc_id", F.size(textops.words_col()).alias("n")
        ).collect()
    )
    acc = 0
    for doc_id, n in rows:
        acc += n
        assert out[doc_id] == (n, acc, (acc - n) // 500), doc_id
    # parallelism invariance
    out2 = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"], r["shard_id"])
        for r in textops.token_shards(
            docs.repartition(16), budget=500, bucket_width=7
        ).collect()
    }
    assert out == out2
    # bucket-width invariance: the derived ~sqrt(N) default width produces
    # the same values as any explicit width (width shapes the plan only)
    out3 = {
        r["doc_id"]: (r["n_tokens"], r["cum_tokens"], r["shard_id"])
        for r in textops.token_shards(docs, budget=500).collect()
    }
    assert out == out3


def test_token_shards_contiguous_and_budget_bounded(spark, docs):
    out = sorted(
        (r["doc_id"], r["shard_id"], r["n_tokens"], r["cum_tokens"])
        for r in textops.token_shards(docs, budget=300).collect()
    )
    # shard ids are non-decreasing in doc order and start at 0
    sids = [s for _, s, _, _ in out]
    assert sids[0] == 0
    assert all(a <= b for a, b in zip(sids, sids[1:]))
    # every shard's first doc starts within the budget boundary
    for (_, s, n, cum) in out:
        assert (cum - n) // 300 == s


def test_quality_classifier_agrees_with_heuristic(spark, docs):
    """The trained tier must recover the weak-label decision boundary it
    was fit on (sanity: the features contain the signal) — ≥90% agreement
    and both classes present."""
    out = textops.quality_classifier_scores(docs).collect()
    assert len(out) == docs.count()
    agree = sum(1 for r in out if r["pred"] == r["label"]) / len(out)
    assert agree >= 0.9, f"classifier agreement {agree:.2f} < 0.9"
    labels = {r["label"] for r in out}
    assert labels == {0.0, 1.0}, f"degenerate label set {labels}"
    assert all(0.0 <= r["prob"] <= 1.0 for r in out)


def test_pii_regex_cross_engine_fuzz(spark):
    """The PII patterns live in the Java-regex ∩ RE2 subset; this fuzz
    check hammers that claim with deterministic adversarial strings
    (boundary chars, partial emails, dotted digit runs) and asserts
    count + redaction-byte equality between Spark (Java) and DuckDB
    (RE2)."""
    import random

    rng = random.Random(42)
    alphabet = list("ab1.-@ +_%") + ["@@", "..", "1.1", "a@b", ".com", "10.0",
                                     "555-", " 42 ", "x.y"]
    rows = []
    for i in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 40)))
        rows.append((i, s))
    # plus structured near-misses
    fixed = [
        "a@b.c", "a@b.co", "@example.com", "user@.com", "1.2.3.4",
        "1.2.3.4.5", "999.999.999.999", "1234567", "12345678",
        "-12345678-", "a1234567890b", "u@h.io extra u2@h2.io",
        "10.0.0.1:8080", "..@..", "%+-@-.x.yz",
    ]
    rows += [(1000 + j, s) for j, s in enumerate(fixed)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = sorted(tuple(r) for r in textops.pii_scrub(df).collect())

    import duckdb

    from crawlspark.textops import PII_EMAIL, PII_IPV4, PII_LONGNUM

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = sorted(
        tuple(r)
        for r in con.execute(
            f"""
            WITH r1 AS (SELECT doc_id, text,
                        regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS r1
                        FROM t),
            r2 AS (SELECT doc_id, text, r1,
                   regexp_replace(r1, '{PII_IPV4}', '<IP>', 'g') AS r2
                   FROM r1)
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT),
                   CAST(len(regexp_extract_all(r1, '{PII_IPV4}')) AS BIGINT),
                   CAST(len(regexp_extract_all(r2, '{PII_LONGNUM}')) AS BIGINT),
                   md5(regexp_replace(r2, '{PII_LONGNUM}', '<NUM>', 'g'))
            FROM r2
            """
        ).fetchall()
    )
    assert got == exp


def test_url_quality_features(spark):
    rows = [
        (1, "http://a.example/p/1"),
        (2, "http://a.example/p/1/deep/a/b?utm_source=x&id=2"),
        (3, "http://a.example/img/pic.jpg"),
        (4, "http://a.example/casino/slots?x=1"),
        (5, "http://a.example/"),
        # query = everything after the FIRST '?': the second '?' is query
        # data, so this URL has params [b=1, c=2?d=3] -> 2, not 1
        (6, "http://a.example/p?b=1&c=2?d=3"),
        (7, "http://a.example/p?"),  # bare trailing '?' -> 0 params
    ]
    df = spark.createDataFrame(rows, "id bigint, url string")
    got = {r["url"]: r.asDict() for r in textops.url_quality(df).collect()}
    assert got[rows[5][1]]["n_query_params"] == 2
    assert got[rows[6][1]]["n_query_params"] == 0
    assert got[rows[0][1]]["path_depth"] == 2
    assert got[rows[0][1]]["n_query_params"] == 0
    r2 = got[rows[1][1]]
    assert r2["path_depth"] == 5 and r2["n_query_params"] == 2
    assert r2["has_tracking"] and not r2["blocklisted"]
    r3 = got[rows[2][1]]
    assert r3["ext_class"] == "media" and not r3["has_tracking"]
    r4 = got[rows[3][1]]
    assert r4["blocklisted"] and r4["n_query_params"] == 1
    assert got[rows[4][1]]["path_depth"] == 1  # trailing slash -> [.., '']


def test_unigram_logprob_known_values(spark):
    """Hand-computed check: 4 docs, vocab {a:4, b:2, c:1}; total=7;
    min_count=2 keeps a,b; c is OOV scoring ln(0.5/7)."""
    import math

    rows = [(1, "a a b"), (2, "a b"), (3, "a c"), (4, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r.asDict() for r in textops.unigram_logprob(df).collect()}
    la, lb, loov = math.log(4 / 7), math.log(2 / 7), math.log(0.5 / 7)
    assert out[1]["n_words"] == 3 and out[1]["n_oov"] == 0
    assert abs(out[1]["mean_logprob"] - round((2 * la + lb) / 3, 6)) < 2e-6
    assert out[3]["n_oov"] == 1
    assert abs(out[3]["mean_logprob"] - round((la + loov) / 2, 6)) < 2e-6
    assert 4 not in out  # empty doc has no words -> no row


def test_curation_ops_parallelism_invariant(spark, docs):
    """Cheap in-suite version of bench/curation.py's digest_match check:
    each op's full sorted output must be identical at 1 and 13 input
    partitions (catches nondeterministic aggregates / order-dependent
    float paths at review time, not bench time)."""
    ops = [
        lambda d: textops.pii_scrub(d),
        lambda d: textops.line_dedup(d, min_df=3),
        lambda d: textops.token_shards(d, budget=500, bucket_width=7),
        lambda d: textops.minhash_signatures(d),
        lambda d: textops.repetition_stats(d),
        lambda d: textops.unigram_logprob(d),
    ]
    for op in ops:
        one = sorted(tuple(r) for r in op(docs.repartition(1)).collect())
        many = sorted(tuple(r) for r in op(docs.repartition(13)).collect())
        assert one == many, f"{op} diverges across parallelism"


def test_pack_sequences_invariants(spark, docs):
    """Concat-and-chunk correctness: within every shard, docs laid out in
    (ordkey, doc_id) order tile the packs exactly — each doc's offset is
    the running token total mod context_len, packs advance by floor
    division, and crosses_boundary is set iff the doc straddles a cut."""
    ctx = 256
    out = textops.pack_sequences(docs, context_len=ctx, n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    total = 0
    for shard, rows in by_shard.items():
        # reconstruct the running sum from the reported fields: a doc at
        # (pack_id, offset) starts at absolute token pack_id*ctx + offset
        starts = sorted(r["pack_id"] * ctx + r["offset_in_pack"] for r in rows)
        tokens = {r["pack_id"] * ctx + r["offset_in_pack"]: r["n_tokens"] for r in rows}
        acc = 0
        for s in starts:
            assert s == acc, f"shard {shard}: gap/overlap at {s} != {acc}"
            acc += tokens[s]
        total += acc
        for r in rows:
            start = r["pack_id"] * ctx + r["offset_in_pack"]
            crosses = r["n_tokens"] > 0 and (start + r["n_tokens"] - 1) // ctx > r["pack_id"]
            assert r["crosses_boundary"] == crosses
    # conservation: every token of every doc is packed exactly once
    n_tokens_all = docs.select(
        F.sum(F.size(textops.words_col())).alias("s")
    ).collect()[0]["s"]
    assert total == n_tokens_all


def test_pack_sequences_parallelism_and_shardcount(spark, docs):
    a = sorted(tuple(r) for r in textops.pack_sequences(docs.repartition(1)).collect())
    b = sorted(tuple(r) for r in textops.pack_sequences(docs.repartition(13)).collect())
    assert a == b
    # laziness: construction must not trigger a job
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    textops.pack_sequences(docs, context_len=128, n_shards=16)
    assert len(tracker.getJobIdsForGroup(None)) == before


# ---------------------------------------------------------------------------
# dup_ngram_coverage (round 5)
# ---------------------------------------------------------------------------

def test_dup_ngram_coverage_planted(spark):
    """Planted corpus: d0/d1 share one 3-gram, d2 self-repeats its own
    3-gram, d3 is unique, d4 is shorter than n (absent from output)."""
    rows = [
        ("d0", "a b c x y"),          # grams: abc bcx cxy
        ("d1", "a b c q r"),          # shares 'a b c' with d0
        ("d2", "p p p p p"),          # 'p p p' ×3 — self-duplication
        ("d3", "m n o z w"),          # all unique
        ("d4", "t u"),                # too short for 3-grams
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r for r in textops.dup_ngram_coverage(df, n=3).collect()}
    assert set(out) == {"d0", "d1", "d2", "d3"}
    assert (out["d0"].n_grams, out["d0"].n_dup_grams) == (3, 1)
    assert (out["d1"].n_grams, out["d1"].n_dup_grams) == (3, 1)
    assert (out["d2"].n_grams, out["d2"].n_dup_grams) == (3, 3)
    assert out["d2"].dup_frac == 1.0
    assert (out["d3"].n_grams, out["d3"].n_dup_grams) == (3, 0)
    assert out["d0"].dup_frac == pytest.approx(round(1 / 3, 6))


def test_dup_ngram_coverage_no_corpus_broadcast(spark, docs):
    """The gram-totals side is corpus-derived: it must arrive over a
    SHUFFLE join (the shuffle_hash hint pins this), never a broadcast —
    the executor-OOM class of VERDICT r4 'What's wrong' #2/#3. Also pins
    the ReuseExchange dedup of the shared per-doc subtree (without it the
    gram scan runs twice)."""
    df = textops.dup_ngram_coverage(docs, n=5)
    # collect() (NOT count(), which executes a different pruned plan) so
    # AQE finalizes THIS df's plan — reuse only shows post-execution
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan
    assert "ReusedExchange" in plan


def test_url_trap_stats_planted_trap(spark):
    """A host with one digit-templated space (calendar-style trap) scores
    n_urls/1; a diverse host scores ~1."""
    from crawlspark import textops

    rows = [(f"http://trap.example/cal/2026/{d}",) for d in range(1, 31)]
    rows += [
        ("http://ok.example/about",),
        ("http://ok.example/products/7",),
        ("http://ok.example/contact",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r["host"]: r for r in textops.url_trap_stats(df).collect()}
    assert got["trap.example"]["n_urls"] == 30
    assert got["trap.example"]["n_templates"] == 1
    assert got["trap.example"]["trap_score"] == 30.0
    assert got["ok.example"]["n_templates"] == 3
    assert got["ok.example"]["trap_score"] == 1.0


def test_registered_domain_suffix_handling(spark):
    from crawlspark import textops
    from pyspark.sql import functions as F

    cases = {
        "www.example.co.uk": "example.co.uk",
        "a.b.news.com.au": "news.com.au",
        "deep.sub.example.com": "example.com",
        "example.com": "example.com",
        "localhost": "localhost",
        "h3.example": "h3.example",
        "UPPER.Example.CO.UK": "Example.CO.UK",  # case-insensitive suffix match
    }
    df = spark.createDataFrame([(h,) for h in cases], "host string")
    got = {
        r["host"]: r["d"]
        for r in df.select(
            "host", textops.registered_domain(F.col("host")).alias("d")
        ).collect()
    }
    assert got == cases
    for h, want in cases.items():
        assert textops.registered_domain_py(h) == want


def test_dsir_pulls_toward_target(spark):
    """DSIR semantics on a planted universe: the target corpus speaks
    vocabulary A; raw docs speaking A must out-weigh raw docs speaking B
    (logw strictly higher for every A-doc than every B-doc), and logw of
    an A-doc grows with its gram count."""
    A = "alpha beta gamma delta epsilon"
    B = "zork quux blorp fizz buzz"
    target = spark.createDataFrame(
        [(100 + i, A) for i in range(8)], "doc_id bigint, text string"
    )
    raw = spark.createDataFrame(
        [(0, A), (1, A + " " + A), (2, B), (3, B + " " + B)],
        "doc_id bigint, text string",
    )
    from crawlspark import textops

    got = {
        r["doc_id"]: (r["logw"], r["n_grams"])
        for r in textops.dsir_logweights(raw, target, n_buckets=32).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    a_w = [got[0][0], got[1][0]]
    b_w = [got[2][0], got[3][0]]
    assert min(a_w) > max(b_w)
    assert got[1][0] > got[0][0]  # more target-like grams, higher weight
    assert got[1][1] > got[0][1]


def test_dsir_deterministic_and_parallelism_invariant(spark, docs):
    from crawlspark import textops
    from pyspark.sql import functions as F

    target = docs.filter(F.col("doc_id") % 7 == 0)
    raw = docs.filter(F.col("doc_id") % 7 != 0)
    a = sorted(
        map(tuple, textops.dsir_logweights(raw, target, n_buckets=64).collect())
    )
    b = sorted(
        map(
            tuple,
            textops.dsir_logweights(
                raw.repartition(7), target.repartition(3), n_buckets=64
            ).collect(),
        )
    )
    assert a == b
    # sample_key is logw + doc-hash Gumbel noise: keys are distinct (the
    # resampling order is a strict total order) and differ from raw logw
    keys = [r[3] for r in a]
    assert len(set(keys)) == len(keys)


def test_bigram_logprob_hand_computed(spark):
    """Interpolated bigram LM (textops.bigram_logprob) against a fully
    hand-derived corpus: unigram floor for the first word and OOV,
    pruned-bigram back-off, hit accounting, and invariance."""
    import math

    from crawlspark import textops

    docs = spark.createDataFrame(
        [("d0", "a b a b"), ("d1", "a b c"), ("d2", "z")],
        "doc_id string, text string",
    )
    rows = {
        r["doc_id"]: r.asDict()
        for r in textops.bigram_logprob(docs, min_count=2, lam=0.7).collect()
    }
    # corpus: a:3 b:3 c:1 z:1, T=8; bigrams "a b":3 (kept), "b a":1,
    # "b c":1 (both pruned); ctx a->3, b->2
    lam, om, T = 0.7, 1.0 - 0.7, 8.0
    ab = math.log(lam * (3 / 3) + om * (3 / T))
    ba = math.log(om * (3 / T))
    bc = math.log(om * (1 / T))
    assert rows["d0"]["mean_logprob"] == round(
        (math.log(3 / T) + ab + ba + ab) / 4, 6
    )
    assert rows["d1"]["mean_logprob"] == round(
        (math.log(3 / T) + ab + bc) / 3, 6
    )
    # single-word doc: unigram only, zero bigrams
    assert rows["d2"]["mean_logprob"] == round(math.log(1 / T), 6)
    assert rows["d2"]["n_bigrams"] == 0 and rows["d2"]["n_hit_bigrams"] == 0
    assert rows["d0"]["n_hit_bigrams"] == 2 and rows["d1"]["n_hit_bigrams"] == 1

    got7 = {
        r["doc_id"]: r.asDict()
        for r in textops.bigram_logprob(
            docs.repartition(7), min_count=2, lam=0.7
        ).collect()
    }
    assert rows == got7


def test_group_sample_exact_counts_and_invariance(spark):
    from crawlspark import textops

    docs = spark.createDataFrame(
        [(i, f"src{i % 3}") for i in range(50)] + [(100, "tiny")],
        "doc_id long, source string",
    )
    got = textops.group_sample(docs, 5).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], []).append((r["smp_rank"], r["doc_id"]))
    # exactly n per big group, min(n, size) for the 1-doc group
    assert {s: len(v) for s, v in by_src.items()} == {
        "src0": 5, "src1": 5, "src2": 5, "tiny": 1,
    }
    # ranks are 1..k dense per group
    for v in by_src.values():
        assert sorted(r for r, _ in v) == list(range(1, len(v) + 1))
    # parallelism invariance of the full draw
    a = sorted(map(tuple, got))
    b = sorted(map(tuple, textops.group_sample(docs.repartition(13), 5).collect()))
    assert a == b
    # the WindowGroupLimit scale shape is real: rank<=n appears as a
    # group-limit in the optimized physical plan
    plan = textops.group_sample(docs, 5)._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_fuzzy_decontaminate_planted(spark):
    """Bipartite LSH decontamination: a train doc that near-duplicates a
    bench doc is flagged with the exact Jaccard; exact copies score 1.0;
    unrelated docs never pair; every CONTAMINATED COPY is flagged (train
    side deliberately not dedup-collapsed)."""
    from crawlspark import textops

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),                          # near-dup of bench 100
            (2, base),                          # exact duplicate copy — must ALSO flag
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, base + " omega"), (200, "unrelated words entirely here okay")],
        "bench_id long, text string",
    )
    got = {
        (r["doc_id"], r["bench_id"]): r["jaccard"]
        for r in textops.fuzzy_decontaminate(docs, bench, threshold=0.3).collect()
    }
    # 8 shared shingles of 9 total in the bench doc: J = 8/9
    j = round(8 / 9, 6)
    assert got == {(1, 100): j, (2, 100): j}
    # parallelism invariance
    got7 = {
        (r["doc_id"], r["bench_id"]): r["jaccard"]
        for r in textops.fuzzy_decontaminate(
            docs.repartition(7), bench.repartition(3), threshold=0.3
        ).collect()
    }
    assert got == got7


def test_winnow_fingerprints_reference_and_guarantee(spark):
    """Winnowing vs a pure-Python reimplementation of the rightmost-min
    rule over the identical md5-32 shingle hashes; the shared-substring
    guarantee (two docs sharing a >= w+2-token run share a fingerprint
    VALUE); short docs emit nothing; parallelism invariance."""
    import hashlib

    from crawlspark import textops
    from crawlspark.textops import MINHASH_M32, MINHASH_P, MINHASH_P1, MINHASH_P2

    W = 4
    shared = "lorem ipsum dolor sit amet consectetur adipiscing elit saturn"
    docs = spark.createDataFrame(
        [
            ("d0", "prefix one two " + shared),
            ("d1", shared + " suffix alpha beta"),
            ("d2", "too short here"),  # 3 words -> 1 shingle < w
        ],
        "doc_id string, text string",
    )

    def py_winnow(text):
        ws = [x for x in text.lower().split(" ") if x]
        wh = [int(hashlib.md5(x.encode()).hexdigest()[:8], 16) for x in ws]
        sh = [
            ((wh[i] * MINHASH_P1 + wh[i + 1] * MINHASH_P2 + wh[i + 2])
             % MINHASH_P) % MINHASH_M32
            for i in range(len(wh) - 2)
        ] if len(wh) >= 3 else []
        out = set()
        for i in range(len(sh) - W + 1):
            win = sh[i:i + W]
            m = min(win)
            pos = i + max(j for j, v in enumerate(win) if v == m) + 1  # 1-based
            out.add((pos, m))
        return out

    got = {}
    for r in textops.winnow_fingerprints(docs, w=W).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["h"]))
    assert got.get("d2") is None
    for d, text in (("d0", "prefix one two " + shared),
                    ("d1", shared + " suffix alpha beta")):
        assert got[d] == py_winnow(text), d
    # guarantee: the 9-token shared run (>= w+2 = 6) forces a common VALUE
    assert {h for _, h in got["d0"]} & {h for _, h in got["d1"]}
    # parallelism invariance
    got7 = {}
    for r in textops.winnow_fingerprints(docs.repartition(7), w=W).collect():
        got7.setdefault(r["doc_id"], set()).add((r["pos"], r["h"]))
    assert got == got7


def test_export_manifest_digest_semantics(spark):
    """Manifest digests: equal corpora produce equal manifests; dropping
    one doc flips exactly its shard's digest (and counts); numeric id
    ordering inside the digest (not string order)."""
    from crawlspark import textops

    docs = spark.createDataFrame(
        [(i, "w " * (i % 7 + 1)) for i in range(1, 40)],
        "doc_id long, text string",
    )
    m1 = {r["shard_id"]: (r["n_docs"], r["n_tokens"], r["docs_md5"])
          for r in textops.export_manifest(docs, budget=20).collect()}
    m2 = {r["shard_id"]: (r["n_docs"], r["n_tokens"], r["docs_md5"])
          for r in textops.export_manifest(docs.repartition(9), budget=20).collect()}
    assert m1 == m2 and len(m1) > 1
    # drop doc 10: its shard's digest flips; shard contents shift after it
    docs2 = docs.filter("doc_id <> 10")
    m3 = {r["shard_id"]: (r["n_docs"], r["n_tokens"], r["docs_md5"])
          for r in textops.export_manifest(docs2, budget=20).collect()}
    assert m3 != m1
    # numeric order: ids 2 and 10 in one shard must digest as '2,10'
    import hashlib

    wide = spark.createDataFrame(
        [(2, "a"), (10, "b")], "doc_id long, text string"
    )
    row = textops.export_manifest(wide, budget=100).collect()
    assert len(row) == 1
    assert row[0]["docs_md5"] == hashlib.md5(b"2,10").hexdigest()


def test_source_length_stats_hand_checked(spark):
    from crawlspark import textops

    docs = spark.createDataFrame(
        [(i, "s0", "w " * i) for i in range(1, 11)]      # lengths 1..10
        + [(100, "s1", "a b c")],                         # single doc
        "doc_id long, source string, text string",
    )
    got = {r["source"]: r.asDict()
           for r in textops.source_length_stats(docs).collect()}
    s0 = got["s0"]
    # nearest-rank over 1..10: p50 = rank ceil(5)=5 -> 5; p90 = rank 9 -> 9
    assert (s0["n_docs"], s0["p50_tokens"], s0["p90_tokens"]) == (10, 5, 9)
    assert s0["mean_tokens"] == 5.5
    s1 = got["s1"]
    assert (s1["n_docs"], s1["p50_tokens"], s1["p90_tokens"]) == (1, 3, 3)
    got7 = {r["source"]: r.asDict()
            for r in textops.source_length_stats(docs.repartition(7)).collect()}
    assert got == got7


def test_tokenizer_seam_threads_through_budget_ops(spark, docs):
    """VERDICT r6 directive #6: every token budget flows through ONE seam
    (textops.tokens_col). 'regex' must change the budgets exactly as the
    TOKEN_REGEX count says; a CUSTOM callable (the production BPE form:
    an Arrow-batched pandas UDF returning the token array) must thread
    through token_shards with no operator change; the 'ws' default must
    stay value-identical to the pre-seam output."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql import functions as F
    from crawlspark import textops

    # default == explicit ws == historical words_col semantics
    base = textops.token_shards(docs, budget=64, bucket_width=16)
    ws = textops.token_shards(docs, budget=64, bucket_width=16, tokenizer="ws")
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, ws.collect()))

    # regex budgets equal an independent recount — over PLANTED
    # punctuation (the raw synthetic corpus is pure space-separated
    # words, on which regex == ws by construction)
    pdocs = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(". x!")).alias("text"),
    )
    rx = {
        r["doc_id"]: r["n_tokens"]
        for r in textops.token_shards(
            pdocs, budget=64, bucket_width=16, tokenizer="regex"
        ).collect()
    }
    expect = {
        r["doc_id"]: r["n"]
        for r in pdocs.select(
            "doc_id",
            F.expr(
                f"size(regexp_extract_all(text, '{textops.TOKEN_REGEX}', 0))"
            ).cast("bigint").alias("n"),
        ).collect()
    }
    assert rx == expect
    ws2 = {
        r["doc_id"]: r["n_tokens"]
        for r in textops.token_shards(
            pdocs, budget=64, bucket_width=16, tokenizer="ws"
        ).collect()
    }
    # non-vacuous: appending '. x!' adds strictly more regex tokens
    # ('.' , 'x', '!' all split) than ws tokens ('.' glues to the last
    # word) on EVERY doc
    assert rx.keys() == ws2.keys() and all(rx[d] > ws2[d] for d in rx)

    # custom vectorized tokenizer: stub "BPE" = 2-char pieces of each word
    @pandas_udf("array<string>")
    def stub_bpe(s: pd.Series) -> pd.Series:
        return s.map(
            lambda t: [
                w[i : i + 2]
                for w in (t or "").lower().split(" ")
                if w
                for i in range(0, len(w), 2)
            ]
        )

    custom = textops.token_shards(
        docs, budget=64, bucket_width=16, tokenizer=lambda c: stub_bpe(c)
    )
    got = {r["doc_id"]: r["n_tokens"] for r in custom.collect()}
    import math

    exp = {
        r["doc_id"]: sum(
            math.ceil(len(w) / 2)
            for w in (r["text"] or "").lower().split(" ")
            if w
        )
        for r in docs.select("doc_id", "text").collect()
    }
    assert got == exp

    # mix_weights threads the same seam (budgets shift on planted text)
    pd2 = docs.select(
        "doc_id", "source", F.concat(F.col("text"), F.lit(". x!")).alias("text")
    )
    mw_ws = {r["source"]: r["n_tokens"] for r in textops.mix_weights(pd2).collect()}
    mw_rx = {
        r["source"]: r["n_tokens"]
        for r in textops.mix_weights(pd2, tokenizer="regex").collect()
    }
    assert mw_ws != mw_rx
    with __import__("pytest").raises(ValueError):
        textops.tokens_col(tokenizer="nope")


def test_dup_spans_planted_islands_and_merge(spark):
    """dup_spans (Lee et al. ExactSubstr cut list) on a planted corpus
    exercising every regime: overlapping-window MERGE (d0/d1 share a
    6-word block → windows at starts 0..3 fold into ONE span), the
    island BREAK (d2/d3 share two blocks separated by unique filler →
    TWO spans each), in-doc self-repeat (d4), a unique doc (absent), and
    a too-short doc (absent)."""
    rows = [
        ("d0", "a b c d e f zz1 zz2"),          # block abcdef at 0..5
        ("d1", "yy1 a b c d e f"),               # same block at 1..6
        ("d2", "g h i u1 u2 u3 j k l m n"),      # blocks ghi + jklmn
        ("d3", "g h i v1 v2 v3 j k l m n"),
        ("d4", "p q p q p q p q"),               # self-repeating 3-grams
        ("d5", "s t u w x"),                     # unique
        ("d6", "s t"),                           # shorter than n
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = textops.dup_spans(df, n=3)
    spans = {
        (r.doc_id, r.span_start): r for r in out.collect()
    }
    by_doc = {}
    for (d, _s), r in spans.items():
        by_doc.setdefault(d, []).append(r)
    # d0: one merged span over tokens [0, 6) from 4 duplicated windows
    (s0,) = by_doc["d0"]
    assert (s0.span_start, s0.span_end, s0.span_tokens, s0.n_windows) == (
        0, 6, 6, 4,
    )
    (s1,) = by_doc["d1"]
    assert (s1.span_start, s1.span_end) == (1, 7)
    # d2/d3: two islands each — [0,3) and the jklmn block
    for d, second_start in (("d2", 6), ("d3", 6)):
        got = sorted(by_doc[d], key=lambda r: r.span_start)
        assert [(r.span_start, r.span_end) for r in got] == [
            (0, 3), (second_start, 11),
        ]
    # d4: every 3-gram repeats in-doc → one full-cover span
    (s4,) = by_doc["d4"]
    assert (s4.span_start, s4.span_end, s4.n_windows) == (0, 8, 6)
    assert "d5" not in by_doc and "d6" not in by_doc


def test_dup_spans_no_corpus_broadcast_and_single_sort(spark, docs):
    """Scale shape: the duplicated-key set is corpus-derived → must
    arrive over a SHUFFLE semi-join (never broadcast, the VERDICT r4
    OOM class); the island scan's two window functions (running max +
    running sum) must share ONE sort per doc partition."""
    df = textops.dup_spans(docs, n=5)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan and "BroadcastExchange" not in plan
    assert "ShuffledHashJoin" in plan
    # one Sort for the doc-keyed window pair: Sort nodes = the window's
    # (doc_id, pos) sort + the final aggregate needs none → exactly 1.
    # Count in the AQE FINAL plan only (toString repeats the initial
    # plan below it, which would double-count).
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("Sort [doc_id") == 1


def test_exactsubstr_cut_applies_cut_list(spark):
    """exactsubstr_cut = dup_spans applied: duplicated spans removed,
    survivors re-joined. Same planted corpus as the dup_spans unit test
    so every regime is exercised: merged-span cut (d0/d1 keep only their
    unique tails), island break (d2/d3 keep the unique filler BETWEEN
    two cut spans), fully-duplicated doc comes back EMPTY (d4), unique
    and too-short docs pass through whole with n_tokens_cut = 0."""
    rows = [
        ("d0", "a b c d e f zz1 zz2"),
        ("d1", "yy1 a b c d e f"),
        ("d2", "g h i u1 u2 u3 j k l m n"),
        ("d3", "g h i v1 v2 v3 j k l m n"),
        ("d4", "p q p q p q p q"),
        ("d5", "s t u w x"),
        ("d6", "s t"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r for r in textops.exactsubstr_cut(df, n=3).collect()}
    assert len(out) == 7  # one row per input doc, pass-throughs included
    expect = {
        "d0": ("zz1 zz2", 2, 6),
        "d1": ("yy1", 1, 6),
        "d2": ("u1 u2 u3", 3, 8),
        "d3": ("v1 v2 v3", 3, 8),
        "d4": ("", 0, 8),
        "d5": ("s t u w x", 5, 0),
        "d6": ("s t", 2, 0),
    }
    for d, (txt, kept, cut) in expect.items():
        r = out[d]
        assert (r.text_cut, r.n_tokens_kept, r.n_tokens_cut) == (
            txt, kept, cut,
        ), d
    # conservation: kept + cut = original token count, every doc
    for d, r in out.items():
        assert r.n_tokens_kept + r.n_tokens_cut == len(
            dict(rows)[d].split()
        ), d


def test_boilerplate_cut_is_per_source(spark):
    """The two regimes corpus-wide line_dedup gets backwards:
    (a) a footer on 3/4 of site A's docs is cut WITHIN A but the same
    line appearing once on site B survives there; (b) a quote carried by
    one doc of every site clears a corpus-wide min_df while being
    template on none — it survives everywhere."""
    rows = [
        ("a1", "A", "alpha text one\nsite a footer\nshared quote"),
        ("a2", "A", "alpha text two\nsite a footer"),
        ("a3", "A", "alpha text three\nsite a footer"),
        ("a4", "A", "alpha text four"),
        ("b1", "B", "beta text one\nsite a footer\nshared quote"),
        ("b2", "B", "beta text two\nshared quote"),
        ("b3", "B", "beta text three"),
        ("c1", "C", "gamma text one\nshared quote"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = {
        r.doc_id: r
        for r in textops.boilerplate_cut(df, min_df=3, min_frac=0.5).collect()
    }
    assert len(out) == 8 and all(out[d].source == s for d, s, _ in rows)
    # (a) footer cut in A (3/4 docs >= both bars), survives in B (1/3)
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out["a2"].n_kept == 1
    assert out["a2"].clean_md5 == md5("alpha text two")
    assert out["b1"].n_kept == 3  # nothing cut in B: footer df=1, quote 2/3 < min_df
    assert out["b1"].clean_md5 == md5("beta text one\nsite a footer\nshared quote")
    # (b) the shared quote: corpus df = 4 >= 3, but per-source max 2/3 → kept
    assert out["a1"].n_kept == 2
    assert out["a1"].clean_md5 == md5("alpha text one\nshared quote")
    assert out["c1"].n_kept == 2
    # corpus-wide line_dedup on the same corpus WOULD cut the quote
    ld = {r.doc_id: r for r in textops.line_dedup(df, min_df=3).collect()}
    assert ld["c1"].n_kept == 1  # quote df=4 >= 3 → cut by the corpus op
    # conservation: n_kept <= n_lines, untouched doc passes through whole
    assert all(r.n_kept <= r.n_lines for r in out.values())
    assert out["a4"].n_kept == out["a4"].n_lines == 1


def test_hashed_tfidf_unit_norm_and_ann_bridge(spark):
    """Hashing-trick TF-IDF: every doc vector is L2-unit (Σw² = 1 within
    rounding), buckets stay inside [0, dim), identical texts hash to
    identical vectors (the property that makes the sparse table a valid
    embedding substitute for the ANN family), and the idf term separates
    a doc of corpus-common words from one of rare words."""
    rows = [
        ("d0", "alpha beta gamma delta"),
        ("d1", "alpha beta gamma delta"),  # exact twin of d0
        ("d2", "alpha alpha alpha epsilon"),
        ("d3", "zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = textops.hashed_tfidf(df, dim=8).collect()
    by_doc = {}
    for r in out:
        assert 0 <= r.bucket < 8
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.w
    assert set(by_doc) == {"d0", "d1", "d2", "d3"}
    for d, vec in by_doc.items():
        assert abs(sum(w * w for w in vec.values()) - 1.0) < 1e-4, d
    assert by_doc["d0"] == by_doc["d1"]  # same text -> same vector
    # cosine through the sparse form: twins = 1, disjoint-vocab docs differ
    def cos(a, b):
        return sum(a.get(k, 0.0) * b.get(k, 0.0) for k in set(a) | set(b))

    assert abs(cos(by_doc["d0"], by_doc["d1"]) - 1.0) < 1e-4
    assert cos(by_doc["d0"], by_doc["d3"]) < 0.999  # no shared words


def test_hashed_tfidf_drives_the_ann_family(spark):
    """The bridge claim end-to-end: pivot the sparse hashed-TF-IDF rows
    to dense array<double> vectors (bounded by dim per doc) and feed
    simsearch.ann_bruteforce_topk — a planted near-twin (one word
    changed) must come back as its source's NEAREST neighbor, ahead of
    unrelated docs, using nothing but the text corpus."""
    from pyspark.sql import functions as F

    from crawlspark import simsearch

    base = [
        (0, "spark shuffles keyed rows between stages for wide operators"),
        (1, "spark shuffles keyed rows between stages for wide operations"),
        (2, "the quick brown fox jumps over the lazy sleeping dog"),
        (3, "parquet files store columns with statistics for pruning scans"),
        (4, "watermark bounded state lets streams drop late arriving data"),
    ]
    docs = spark.createDataFrame(base, "doc_id long, text string")
    dim = 32
    sparse = textops.hashed_tfidf(docs, dim=dim)
    dense = sparse.groupBy("doc_id").agg(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda b: F.coalesce(
                F.element_at(
                    F.map_from_entries(F.collect_list(F.struct("bucket", "w"))), b
                ),
                F.lit(0.0),
            ),
        ).alias("embedding")
    ).select(F.col("doc_id").alias("vec_id"), "embedding")
    top = simsearch.ann_bruteforce_topk(dense, k=1, n_queries=1).collect()
    assert len(top) == 1
    assert (top[0].q_id, top[0].vec_id) == (0, 1)  # the near-twin wins
    # one changed word in an 8-word doc carries high idf weight (df=1),
    # so the twin cosine sits well under 1.0 but far above strangers
    assert top[0].cos > 0.7


def test_topic_scores_orders_by_relevance(spark):
    """Focused-crawl relevance: a doc made of the topic words outranks a
    doc sharing one topic word, which outranks a disjoint-vocab doc
    (absent from the output only if it shares no bucket — at dim=8 it
    may collide, so assert order, not absence); topic words missing
    from the corpus ride the smooth-idf LEFT JOIN path; an empty topic
    raises."""
    import pytest as _pytest

    rows = [
        (0, "spark window query spark window query"),
        (1, "spark shuffles data between executors and stages"),
        (2, "the quick brown fox jumps over a lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r.topic_cos
        for r in textops.topic_scores(df, "spark window query", dim=8).collect()
    }
    assert out[0] > out[1]
    assert out[0] > 0.9  # near-pure topic doc
    assert out[1] > out.get(2, -1.0)
    # unseen topic word: still well-defined (df=0 smooth idf)
    out2 = textops.topic_scores(df, "spark zzzunseenzzz", dim=8).collect()
    assert {r.doc_id for r in out2} and all(
        r.topic_cos == r.topic_cos for r in out2
    )
    with _pytest.raises(ValueError, match="at least one word"):
        textops.topic_scores(df, "   ")


def test_tfidf_family_single_corpus_pass_plans(spark):
    """Round-8 plan contract for the hashed-TF-IDF family (VERDICT r7
    'What's wrong #3'): hashed_tfidf explodes the corpus exactly ONCE
    (df is a word-keyed window over the same tf rows; the round-7
    separate df aggregate + self-join re-ran the explode), and
    topic_scores adds exactly one more Generate — the topic-side df
    pass, broadcast-semi-filtered to the ≤k topic words BELOW its
    aggregate so only matching rows reach any exchange."""
    rows = [(f"d{i}", "alpha beta gamma delta " * (i % 3 + 1)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id string, text string")

    vec_plan = (
        textops.hashed_tfidf(df, dim=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert vec_plan.count("Generate") == 1, vec_plan

    top = textops.topic_scores(df, "alpha zzzunseen", dim=8)
    top_plan = top._jdf.queryExecution().executedPlan().toString()
    assert top_plan.count("Generate") == 2, top_plan
    # the topic-side df pass filters on the broadcast topic-word set
    # below its aggregates (semi-join pushdown), so its shuffle carries
    # only topic-word rows
    assert "LeftSemi" in top_plan, top_plan
