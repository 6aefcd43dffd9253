"""Similarity search over the ``embeddings`` table (vec_id, embedding:
array<float>, label): brute-force cosine top-k (exact baseline / recall
oracle) and LSH-bucketed variants (the scale paths).

All JVM higher-order functions (`zip_with`/`aggregate`) — the dot products
run inside codegen, no Python. Cosines are computed in double in array
index order (bit-reproducible; matches the DuckDB oracle's
list_inner_product over DOUBLE[]), rounded to 6 places so rank tie-breaks
are stable across engines.

Quantizer: signs of dot products against ``hyperplanes()`` — deterministic
md5-derived pseudo-random hyperplanes over ALL dimensions (real embeddings
are not axis-aligned, so raw-dimension signs would skew buckets; random
projections balance them). The same float constants are inlined into the
DuckDB oracle SQL, so both engines quantize identically; the sign test uses
the 6-place-rounded dot on both sides to keep the bit decision engine-
independent.

Scale shapes:
- ``ann_lsh_topk``: multi-table LSH — L independent hash tables of k sign
  bits each; a query unions the candidates from its bucket in every table
  (the classic recall amplifier: P[found] = 1-(1-p^k)^L). (L, k) is the
  recall/cost dial: the defaults (8×4) are tuned for the 500-row test tier;
  at 10^9 vectors you raise k (more, smaller buckets) and keep L — cost per
  query stays O(L · bucket), never a scan. Brute force remains the recall
  oracle.
- ``embedding_neardup_pairs``: banded signatures (NEARDUP_BANDS bands of
  NEARDUP_BAND_BITS sign bits; pairs collide if ANY band matches — the
  MinHash-LSH band trick applied to hyperplane signs). The join is keyed on
  (band_idx, band_val): no all-pairs product anywhere. A 0.99-cosine pair
  disagrees on one plane with p≈0.045, so P[missed by all bands] ≈ 8e-4.
  The sampled all-pairs variant is kept as the recall oracle.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window, functions as F

ANN_K = 10
N_QUERIES = 5  # queries = lowest vec_ids, deterministic
EMB_DIM = 64
ANN_TABLES = 8         # L hash tables
ANN_TABLE_BITS = 4     # k sign bits per table (16 buckets/table at test tier)
NEARDUP_BANDS = 4
NEARDUP_BAND_BITS = 4  # 16 planes total for the near-dup signature


def hyperplanes(n_planes: int, dim: int = EMB_DIM) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is an
    md5-derived uniform in [-1, 1). ``repr`` of these floats round-trips
    exactly, so the identical constants can be inlined into DuckDB SQL."""
    out = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(
                hashlib.md5(f"hp{p}#{d}".encode()).digest()[:8], "big"
            )
            row.append(h / 2**63 - 1.0)
        out.append(row)
    return out


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


def _plane_bit(emb_d, plane: list[float]):
    """1 if the (6-place-rounded) projection onto `plane` is positive.
    Rounding before the sign test keeps the bit engine-independent."""
    lit = F.array(*[F.lit(v) for v in plane])
    return F.when(F.round(_dot(emb_d, lit), 6) > 0, F.lit(1)).otherwise(F.lit(0))


def lsh_table_cols(emb_col, n_tables: int = ANN_TABLES, bits: int = ANN_TABLE_BITS) -> list:
    """One sign-bucket id per hash table; table t packs the sign bits of
    hyperplanes [t·bits, (t+1)·bits)."""
    emb_d = _as_double(emb_col)
    planes = hyperplanes(n_tables * bits)
    out = []
    for t in range(n_tables):
        val = F.lit(0)
        for i in range(bits):
            val = val + _plane_bit(emb_d, planes[t * bits + i]) * F.lit(1 << i)
        out.append(val)
    return out


def neardup_band_cols(emb_col) -> list:
    """NEARDUP_BANDS band values, each packing NEARDUP_BAND_BITS sign bits."""
    emb_d = _as_double(emb_col)
    planes = hyperplanes(NEARDUP_BANDS * NEARDUP_BAND_BITS)
    bands = []
    for b in range(NEARDUP_BANDS):
        val = F.lit(0)
        for i in range(NEARDUP_BAND_BITS):
            val = val + _plane_bit(emb_d, planes[b * NEARDUP_BAND_BITS + i]) * F.lit(1 << i)
        bands.append(val)
    return bands


def ann_bruteforce_topk(
    emb: DataFrame, k: int = ANN_K, n_queries: int = N_QUERIES
) -> DataFrame:
    """Exact cosine top-k per query vector. INTENTIONALLY a broadcast-q
    cross join: this is the recall oracle for a handful of queries, not a
    serving path — ann_lsh_topk is the scale path."""
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


def _lsh_keyed(emb: DataFrame, n_tables: int, bits: int) -> DataFrame:
    """(vec_id, tbl, bkt) — one row per vector per hash table."""
    tables = lsh_table_cols(F.col("embedding"), n_tables, bits)
    return emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), tables[t].alias("bkt"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bkt").alias("bkt"))


def ann_lsh_candidates(
    emb: DataFrame,
    n_queries: int = N_QUERIES,
    n_tables: int = ANN_TABLES,
    bits: int = ANN_TABLE_BITS,
    multiprobe: int = 1,
) -> DataFrame:
    """Candidate (q_id, vec_id) pairs for the multi-table LSH ANN.

    multiprobe=h additionally probes every bucket within Hamming distance
    ≤ h of the query's bucket in EACH table (classic multi-probe LSH: the
    next-most-likely buckets are the sign-flips of the nearest planes).
    h=1 probes (1+bits) of the 2^bits buckets per table — candidate volume
    stays O(L·(1+bits)·bucket), a fixed multiple of single-probe, never a
    scan; recall rises steeply because a near neighbor that disagrees on
    exactly one plane of every table is recovered."""
    keyed = _lsh_keyed(emb, n_tables, bits)
    q = emb.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    qk = q.join(keyed, q["q_id"] == keyed["vec_id"]).select("q_id", "tbl", "bkt")
    if multiprobe:
        variants = [F.col("bkt")]
        variants += [F.col("bkt").bitwiseXOR(F.lit(1 << i)) for i in range(bits)]
        if multiprobe >= 2:
            variants += [
                F.col("bkt").bitwiseXOR(F.lit((1 << i) | (1 << j)))
                for i in range(bits)
                for j in range(i + 1, bits)
            ]
        qk = qk.select(
            "q_id", "tbl", F.explode(F.array(*variants)).alias("bkt")
        ).distinct()
    return (
        F.broadcast(qk)
        .join(keyed, ["tbl", "bkt"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
        .distinct()
    )


def ann_lsh_topk(
    emb: DataFrame,
    k: int = ANN_K,
    n_queries: int = N_QUERIES,
    n_tables: int = ANN_TABLES,
    bits: int = ANN_TABLE_BITS,
    multiprobe: int = 1,
) -> DataFrame:
    """Multi-table multi-probe LSH ANN: candidates = union over L tables of
    the query's bucket and its Hamming-≤h neighbors, deduped on ids BEFORE
    scoring, exact cosine on the union only. Join shape: keyed self-join on
    (tbl, bkt) with the tiny query side broadcast — never a cross join."""
    q = emb.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    cand_ids = ann_lsh_candidates(emb, n_queries, n_tables, bits, multiprobe)
    scored = (
        cand_ids.join(emb, "vec_id")
        .join(F.broadcast(q), "q_id")
        .select(
            "q_id",
            "vec_id",
            F.round(cosine_col(F.col("q_emb"), F.col("embedding")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "vec_id", "cos", "rnk")
    )


IVF_CENTROIDS = 16
IVF_NPROBE = 4


def kmeans_codebook(
    emb: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """MLlib-trained IVF codebook: distributed k-means over the embedding
    column, returned as the (cent_id, c_emb) dim ivf_topk consumes — the
    production codebook behind the exact same assignment/probe shape as
    the deterministic stand-in (which remains the DuckDB-oracle tier; a
    trained model is not SQL-reproducible). Seeded, so runs are stable."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.select(
        array_to_vector(_as_double(F.col("embedding"))).alias("features")
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=max_iter).fit(feats)
    centers = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return emb.sparkSession.createDataFrame(
        centers, "cent_id int, c_emb array<double>"
    )


def default_codebook(emb: DataFrame, n_centroids: int = IVF_CENTROIDS) -> DataFrame:
    """Deterministic training-free codebook: the `n_centroids` lowest-id
    vectors as centroids (the DuckDB-oracle tier; kmeans_codebook is the
    trained production path behind the same shape)."""
    return emb.orderBy("vec_id").limit(n_centroids).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )


def ivf_assign(emb: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, embedding, cent_id): each vector assigned to its
    nearest-cosine centroid — the inverted-list build shared by ivf_topk
    and semantic_dedup. Broadcast codebook, cosine rounded to 6 places,
    ties broken by centroid id, so any SQL engine assigns identically."""
    cents = F.broadcast(codebook)
    scored_assign = emb.crossJoin(cents).select(
        "vec_id",
        "embedding",
        "cent_id",
        F.round(cosine_col(F.col("embedding"), F.col("c_emb")), 6).alias("c_cos"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("c_cos").desc(), F.col("cent_id").asc()
    )
    return (
        scored_assign.withColumn("arnk", F.row_number().over(w_assign))
        .filter(F.col("arnk") == 1)
        .select("vec_id", "embedding", "cent_id")
    )


def ivf_topk(
    emb: DataFrame,
    k: int = ANN_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = IVF_CENTROIDS,
    nprobe: int = IVF_NPROBE,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """IVF-structured ANN: vectors are assigned to their nearest centroid
    (inverted lists); a query scans only the lists of its `nprobe` nearest
    centroids — at 10^9 vectors the scan fraction is nprobe/n_centroids
    regardless of data size, and the assignment join is a broadcast of the
    tiny codebook.

    Codebook: pass `codebook` (e.g. kmeans_codebook — the trained
    production path) or default to the `n_centroids` lowest-vec_id vectors,
    deterministic and training-free (the DuckDB-oracle tier). Ties broken
    by centroid id; cosine rounded to 6 places so the oracle assigns
    identically."""
    if codebook is None:
        codebook = default_codebook(emb, n_centroids)
    cents = F.broadcast(codebook)
    assigned = ivf_assign(emb, codebook)
    q = emb.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    q_scored = F.broadcast(q).crossJoin(cents).select(
        "q_id",
        "q_emb",
        "cent_id",
        F.round(cosine_col(F.col("q_emb"), F.col("c_emb")), 6).alias("c_cos"),
    )
    w_probe = Window.partitionBy("q_id").orderBy(
        F.col("c_cos").desc(), F.col("cent_id").asc()
    )
    probes = (
        q_scored.withColumn("prnk", F.row_number().over(w_probe))
        .filter(F.col("prnk") <= nprobe)
        .select("q_id", "q_emb", "cent_id")
    )
    cands = F.broadcast(probes).join(assigned, "cent_id").filter(
        F.col("vec_id") != F.col("q_id")
    )
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


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-banded: vectors are
    exploded into (band_idx, band_val) keys; the self-join is keyed on the
    band — candidate volume is O(Σ bucket²) per band, never all-pairs.
    Collisions are deduped on ids BEFORE the cosine so each candidate pair
    is scored once."""
    bands = neardup_band_cols(F.col("embedding"))
    keyed = emb.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), bands[b].alias("band_val"))
                    for b in range(NEARDUP_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "embedding", F.col("bk.band_idx").alias("band_idx"), F.col("bk.band_val").alias("band_val"))
    a = keyed.select(
        F.col("band_idx").alias("ai"), F.col("band_val").alias("av"),
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"),
    )
    b = keyed.select(
        F.col("band_idx").alias("bi"), F.col("band_val").alias("bv"),
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"),
    )
    coll = a.join(
        b,
        (F.col("ai") == F.col("bi"))
        & (F.col("av") == F.col("bv"))
        & (F.col("vec_a") < F.col("vec_b")),
    )
    uniq = coll.groupBy("vec_a", "vec_b").agg(
        F.first("emb_a").alias("emb_a"), F.first("emb_b").alias("emb_b")
    )
    return (
        uniq.select(
            "vec_a",
            "vec_b",
            F.round(cosine_col(F.col("emb_a"), F.col("emb_b")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_neardup_allpairs(
    emb: DataFrame, threshold: float = 0.95, sample_mod: int = 101
) -> DataFrame:
    """Recall oracle for the banded variant: exact all-pairs cosine on a
    deterministic subsample. NOT a scale path (O(n²) on the sample by
    construction) — it exists to measure the banded variant's recall."""
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


# ---------------------------------------------------------------------------
# embedding compression + semantic dedup
# ---------------------------------------------------------------------------

def embed_quantize(emb: DataFrame) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the 4× storage /
    bandwidth reduction step an embedding store runs before ANN at 10^9+
    vectors (public practice: faiss SQ8 / product-quantization family).
    Per vector: scale = max |component|, code_i = floor(x_i/scale·127 + ½)
    (round-half-up expressed as floor so every engine rounds identically),
    plus the mean absolute reconstruction error as the quality audit.

    Output is (vec_id, n_dims, scale, max_abs_code, mean_abs_err,
    codes_md5) — codes_md5 pins every code byte while keeping the checked
    row compact. Pure per-row JVM higher-order functions: one scan, no
    shuffle, no UDF, runs inside codegen. The double-cast vector, scale,
    and codes array are STAGED as their own projections so each is
    computed once per row — inlined, Catalyst's project collapse
    re-evaluates the arrays per consuming expression (the same trap
    profiled in textops.shingle_hash_col)."""
    t1 = emb.select("vec_id", _as_double(F.col("embedding")).alias("d"))
    # the raw scale is named scale_raw: the output column aliases the
    # ROUNDED value as "scale", and Spark's lateral column alias
    # resolution would otherwise make every F.col("scale") inside the
    # same select list bind to that rounded alias (observed: the error
    # audit silently computed against the 6-place scale and crossed a
    # rounding boundary vs the oracle)
    t2 = t1.select(
        "vec_id",
        "d",
        F.array_max(F.transform(F.col("d"), lambda x: F.abs(x))).alias("scale_raw"),
    )
    t3 = t2.select(
        "vec_id",
        "d",
        "scale_raw",
        F.when(
            F.col("scale_raw") > 0,
            F.transform(
                F.col("d"),
                lambda x: F.floor(x / F.col("scale_raw") * 127.0 + 0.5).cast("int"),
            ),
        )
        .otherwise(F.transform(F.col("d"), lambda x: F.lit(0)))
        .alias("codes"),
    )
    recon_err = F.aggregate(
        F.zip_with(
            F.col("d"),
            F.col("codes"),
            lambda x, c: F.abs(x - c.cast("double") * F.col("scale_raw") / 127.0),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.size(F.col("d"))
    return t3.select(
        "vec_id",
        F.size("d").alias("n_dims"),
        F.round("scale_raw", 6).alias("scale"),
        F.array_max(F.transform(F.col("codes"), lambda c: F.abs(c))).alias(
            "max_abs_code"
        ),
        F.round(
            F.when(F.col("scale_raw") > 0, recon_err).otherwise(F.lit(0.0)), 6
        ).alias("mean_abs_err"),
        F.md5(
            F.concat_ws(",", F.transform(F.col("codes"), lambda c: c.cast("string")))
        ).alias("codes_md5"),
    )


SEMDEDUP_CLUSTER_CAP = 10_000  # max vectors per cluster admitted to the pair join


def semantic_cluster_stats(
    emb: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    codebook: DataFrame | None = None,
    max_cluster_size: int = SEMDEDUP_CLUSTER_CAP,
) -> DataFrame:
    """Per-cluster audit for semantic_dedup — the mirror of lsh_band_stats
    for the SemDeDup family. One row per centroid: (cent_id, n_vecs,
    n_pairs = n·(n−1)/2 the pair join WOULD generate, capped = whether
    semantic_dedup excludes the cluster under the same max_cluster_size).
    Run it with the same codebook/cap as the dedup call: Σ n_pairs over
    uncapped rows is the exact candidate volume, and any capped=true row
    is a degenerate hot cluster (e.g. empty-text embeddings collapsing
    onto one centroid) that would otherwise go quadratic."""
    if codebook is None:
        codebook = default_codebook(emb, n_centroids)
    assigned = ivf_assign(emb, codebook).select("vec_id", "cent_id")
    return assigned.groupBy("cent_id").agg(
        F.count("*").alias("n_vecs"),
        (F.count("*") * (F.count("*") - 1) / 2).cast("bigint").alias("n_pairs"),
        (F.count("*") > F.lit(max_cluster_size)).alias("capped"),
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_centroids: int = IVF_CENTROIDS,
    codebook: DataFrame | None = None,
    max_cluster_size: int = SEMDEDUP_CLUSTER_CAP,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023, public
    literature): cluster the embedding space, compare pairs only WITHIN a
    cluster, keep one representative per connected near-dup group.
    Returns (vec_id, cluster_id, is_rep) for every vector in at least one
    ≥threshold pair — keep is_rep rows, drop the rest.

    Scale shape: the centroid assignment is a broadcast of the tiny
    codebook (ivf_assign); the quadratic pair step is BOUNDED BY CLUSTER —
    candidate volume is O(Σ cluster²), so n_centroids is sized with the
    corpus (≈√N keeps expected cluster size √N and the join uniform).
    Clusters larger than max_cluster_size are EXCLUDED from the pair join
    instead of joined quadratically (a single degenerate cluster — e.g.
    empty-text embeddings all at one centroid — would otherwise dominate
    the job); excluded clusters are visible as capped=true rows in
    semantic_cluster_stats(same codebook, same cap), never silent. The
    final grouping is the O(log diameter) pointer-jumping connected
    components, never a transitive closure in the driver. Cross-cluster
    near-dups are out of scope BY DESIGN (the SemDeDup trade: recall is
    bounded by the clustering — the banded embedding_neardup_pairs tier
    is the cluster-free alternative when full recall matters)."""
    from crawlspark.graphops import dedup_clusters

    if codebook is None:
        codebook = default_codebook(emb, n_centroids)
    assigned = ivf_assign(emb, codebook).select("vec_id", "embedding", "cent_id")
    # Hot-cluster guard: the admitted-cluster list is ≤ n_centroids rows
    # (codebook-sized, corpus-independent), so the broadcast is safe.
    admitted = (
        assigned.groupBy("cent_id")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") <= max_cluster_size)
        .select("cent_id")
    )
    assigned = assigned.join(F.broadcast(admitted), "cent_id")
    a = assigned.alias("a")
    b = assigned.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.cent_id") == F.col("b.cent_id"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(
                cosine_col(F.col("a.embedding"), F.col("b.embedding")), 6
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b")
    )
    return dedup_clusters(pairs)


# ---------------------------------------------------------------------------
# product quantization (Jégou, Douze & Schmid, TPAMI 2011) — the third leg
# of the faiss-style compression trio next to embed_quantize (SQ8) and the
# IVF codebook: split each vector into PQ_M subspaces, quantize each to one
# of PQ_KSUB sub-centroids, store PQ_M small codes; search via ADC
# (asymmetric distance computation) — the query keeps full precision, each
# candidate's distance is a sum of PQ_M table lookups.
# ---------------------------------------------------------------------------

PQ_M = 4                      # subspaces (EMB_DIM/PQ_M dims each)
PQ_KSUB = 16                  # sub-centroids per subspace (4-bit codes)
PQ_SUBDIM = EMB_DIM // PQ_M


def _l2sq(a, b):
    """Squared L2 as ip(a,a) − 2·ip(a,b) + ip(b,b) — every term a _dot in
    array index order, so both engines (list_inner_product in DuckDB)
    produce bit-identical doubles."""
    return _dot(a, a) - 2 * _dot(a, b) + _dot(b, b)


def pq_subcodebooks(emb: DataFrame, ksub: int = PQ_KSUB) -> DataFrame:
    """Deterministic training-free sub-codebooks (the DuckDB-oracle tier,
    default_codebook's discipline): sub-centroid j of subspace s is the
    s-th slice of the j-th-lowest-vec_id vector. Returns
    (sub_id, cent_id, c_sub) with PQ_M·ksub rows — codebook-sized
    metadata. Production swap point: per-subspace seeded MLlib k-means
    (kmeans_codebook's pattern) behind the same (sub_id, cent_id, c_sub)
    shape."""
    base = emb.orderBy("vec_id").limit(ksub).select(
        F.row_number().over(Window.orderBy("vec_id")).alias("rn"),
        _as_double(F.col("embedding")).alias("e"),
    )
    subs = base.select(
        (F.col("rn") - 1).alias("cent_id"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("sub_id"),
                    F.slice("e", s * PQ_SUBDIM + 1, PQ_SUBDIM).alias("c_sub"),
                )
                for s in range(PQ_M)
            ])
        ).alias("b"),
    )
    return subs.select("cent_id", F.col("b.sub_id").alias("sub_id"),
                       F.col("b.c_sub").alias("c_sub"))


def pq_encode(emb: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(vec_id, sub_id, code): each vector's subspace slice assigned to
    its nearest sub-centroid by 6-dp-rounded squared L2, ties to the
    lower cent_id — engine-independent by construction. One broadcast of
    the PQ_M·ksub codebook against the exploded (vec, subspace) slices;
    the argmin is a WindowGroupLimit-compiled row_number over
    (vec_id, sub_id) groups of ksub rows."""
    sliced = emb.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("sub_id"),
                    F.slice(_as_double(F.col("embedding")),
                            s * PQ_SUBDIM + 1, PQ_SUBDIM).alias("v_sub"),
                )
                for s in range(PQ_M)
            ])
        ).alias("b"),
    ).select("vec_id", F.col("b.sub_id").alias("sub_id"),
             F.col("b.v_sub").alias("v_sub"))
    scored = sliced.join(F.broadcast(codebooks), "sub_id").select(
        "vec_id", "sub_id", "cent_id",
        F.round(_l2sq(F.col("v_sub"), F.col("c_sub")), 6).alias("d"),
    )
    w = Window.partitionBy("vec_id", "sub_id").orderBy(
        F.col("d").asc(), F.col("cent_id").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("vec_id", "sub_id", F.col("cent_id").alias("code"))
    )


def pq_topk(
    emb: DataFrame,
    k: int = ANN_K,
    n_queries: int = N_QUERIES,
    ksub: int = PQ_KSUB,
) -> DataFrame:
    """ADC top-k: queries (the n_queries lowest vec_ids, full precision)
    score every encoded vector as Σ_s dtable[q, s, code(v, s)] — the
    distance table is queries×PQ_M×ksub rows (query-sized, the ONLY
    broadcast); the scan is one keyed join on (sub_id, code) + one
    map-side-combinable sum + a WindowGroupLimit top-k. Distances round
    to 6 dp BEFORE ranking; ties break on vec_id. Codes come from
    pq_subcodebooks/pq_encode (deterministic tier)."""
    cbs = pq_subcodebooks(emb, ksub)
    codes = pq_encode(emb, cbs)
    queries = emb.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("q_id"),
        _as_double(F.col("embedding")).alias("q_emb"),
    )
    qsub = queries.select(
        "q_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("sub_id"),
                    F.slice("q_emb", s * PQ_SUBDIM + 1, PQ_SUBDIM).alias("q_sub"),
                )
                for s in range(PQ_M)
            ])
        ).alias("b"),
    ).select("q_id", F.col("b.sub_id").alias("sub_id"),
             F.col("b.q_sub").alias("q_sub"))
    # table entries as ×10^6 fixed-point integers (floor(x+0.5), the
    # repo-wide rule): the ADC sum of PQ_M doubles would be
    # aggregation-order-dependent in the last ulp; integer partials sum
    # exactly in any order, in any engine
    dtable = qsub.join(F.broadcast(cbs), "sub_id").select(
        "q_id", "sub_id", F.col("cent_id").alias("code"),
        F.floor(
            F.round(_l2sq(F.col("q_sub"), F.col("c_sub")), 6) * 1e6 + 0.5
        ).cast("long").alias("dpart_fp"),
    )
    scored = (
        codes.join(F.broadcast(dtable), ["sub_id", "code"])
        .groupBy("q_id", "vec_id")
        .agg(
            F.round(F.sum("dpart_fp") / F.lit(1e6), 6).alias("adc_dist")
        )
        .filter(F.col("q_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "adc_dist", "rank")
    )


def pq_kmeans_subcodebooks(
    emb: DataFrame,
    ksub: int = PQ_KSUB,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """Trained PQ sub-codebooks: one seeded MLlib k-means PER SUBSPACE
    over the sliced corpus (the kmeans_codebook pattern) — the production
    tier behind the same (sub_id, cent_id, c_sub) shape pq_encode /
    pq_topk consume; the deterministic pq_subcodebooks stand-in remains
    the DuckDB-oracle tier (a trained model is not SQL-reproducible).
    PQ_M small fits (ksub centroids each) — driver-looped over subspaces
    by design, each fit a distributed job."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    rows = []
    for s in range(PQ_M):
        feats = emb.select(
            array_to_vector(
                F.slice(_as_double(F.col("embedding")),
                        s * PQ_SUBDIM + 1, PQ_SUBDIM)
            ).alias("features")
        )
        model = KMeans(k=ksub, seed=seed, maxIter=max_iter).fit(feats)
        rows.extend(
            (int(j), s, [float(x) for x in c])
            for j, c in enumerate(model.clusterCenters())
        )
    return emb.sparkSession.createDataFrame(
        rows, "cent_id int, sub_id int, c_sub array<double>"
    )


def pq_rerank_topk(
    emb: DataFrame,
    k: int = ANN_K,
    shortlist: int = 100,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """The production PQ pipeline: ADC SHORTLIST (pq_topk, compressed
    scan — candidates never touch full vectors) → EXACT squared-L2
    re-rank of the shortlist only. Compression does the corpus-scale
    work; precision costs O(queries·shortlist) full-vector reads — the
    standard two-stage trade (Jégou et al. §V). Recall against exact
    top-k is bounded by the shortlist stage and tested
    (tests/test_simsearch.py)."""
    cand = pq_topk(emb, k=shortlist, n_queries=n_queries).select(
        "q_id", "vec_id"
    )
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("emb"))
    q = e.orderBy("vec_id").limit(n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("emb").alias("q_emb")
    )
    scored = (
        cand.join(F.broadcast(q), "q_id")
        .join(e, "vec_id")
        .select(
            "q_id",
            "vec_id",
            F.round(_l2sq(F.col("q_emb"), F.col("emb")), 6).alias("l2sq"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("l2sq").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "l2sq", "rank")
    )
