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
