"""Training-data text operations over the flat ``documents`` table:
dedup (exact, MinHash+LSH, SimHash, n-gram Jaccard), language-ID
heuristic, quality scoring, token counting, document fingerprinting.

Everything here is PURE JVM (built-in / higher-order functions — no Python
UDFs): at 100 TB these run inside whole-stage codegen with map-side
partial aggregation, and every operator has an exact DuckDB-SQL oracle in
__spark_entry__.py. md5 is the base hash throughout because it is the one
hash both engines share bit-for-bit.

Scale notes:
- MinHash: one explode + ONE groupBy with k min-aggregates (map-side
  combine collapses each doc's shingles before the shuffle); each shingle
  is md5-hashed ONCE and the k components are affine maps of that base
  hash (minhash_coeffs) — k multiply-adds instead of k md5s per shingle.
- LSH banding: signature → band hashes → explode(bands) → self-join on
  (band_idx, band_hash); the join key is pre-hashed so the shuffle is
  uniform; candidate pairs deduped with distinct.
- SimHash: explode words → 64 conditional-sum aggregates in one pass.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from pyspark.sql import DataFrame, functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "as"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "auf", "für", "ein"],
    "fr": ["le", "la", "les", "et", "de", "des", "un", "une", "est", "pour"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "en", "un", "una"],
}
LANGS = ["en", "de", "fr", "es"]  # tie-break priority order
MINHASH_K = 16
LSH_BANDS = 4  # 4 bands x 4 rows
SIMHASH_BITS = 60  # md5-derived 60-bit space (15 hex chars)


def words_col(text_col="text"):
    """Non-empty lowercase whitespace tokens (split on single space,
    empties filtered — identical semantics in the DuckDB oracle)."""
    return F.filter(F.split(F.lower(F.col(text_col)), " "), lambda w: w != "")


def tokens_col(text_col="text", tokenizer="ws"):
    """The tokenizer seam (one choke point for every token budget in the
    curation family — token_shards, pack_sequences, corpus_mix,
    mix_weights thread a ``tokenizer=`` through here). Returns an
    array<string> column of tokens:

    - ``"ws"`` (default): ``words_col`` — the whitespace form every
      existing oracle mirrors; default digests are unchanged because the
      emitted expression is IDENTICAL.
    - ``"regex"``: the TOKEN_REGEX BPE-style pre-tokenizer (letter runs /
      digit runs / single punctuation — the GPT-2 pre-tokenizer's shape),
      still pure JVM (`regexp_extract_all`) and exactly mirrorable in
      DuckDB.
    - callable: ``(text Column) -> array<string> Column`` — the
      production form. A real subword tokenizer (BPE/SentencePiece merges
      over a broadcast vocab) plugs in as an Arrow-batched pandas UDF
      returning the token array; operators never change. Tested with a
      non-whitespace stub in tests/test_curation.py.

    Scale note: counting ops only ever take ``F.size`` of this column, so
    Catalyst prunes the array before any shuffle — a tokenizer swap never
    changes an operator's plan shape, only the map-side expression."""
    if callable(tokenizer):
        return tokenizer(F.col(text_col))
    if tokenizer == "ws":
        return words_col(text_col)
    if tokenizer == "regex":
        return F.expr(f"regexp_extract_all({text_col}, '{TOKEN_REGEX}', 0)")
    raise ValueError(f"unknown tokenizer: {tokenizer!r}")


def shingles_col(words, n: int = 3):
    """Word n-gram shingles, [] when the doc is shorter than n words."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(words, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------------

def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups by full-text hash; deterministic representative."""
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("rep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


MINHASH_P = (1 << 61) - 1  # Mersenne prime for the affine permutation family
MINHASH_P1 = 1000003  # word-combination primes (3-word shingle hash)
MINHASH_P2 = 999983
MINHASH_M32 = 1 << 32  # shingle hash reduced to 32 bits so a_i*h fits int64


def minhash_coeffs(k: int = MINHASH_K) -> tuple[list[int], list[int]]:
    """Deterministic affine-permutation coefficients (a_i, b_i), derived
    from md5 so the IDENTICAL integers can be inlined into the DuckDB
    oracle SQL. a_i < 2^29 keeps a_i·h32 < 2^61 — no int64 overflow in
    any engine (DuckDB errors on BIGINT overflow; Spark ANSI too)."""
    a, b = [], []
    for i in range(k):
        da = int.from_bytes(hashlib.md5(f"mh-a-{i}".encode()).digest()[:8], "big")
        db = int.from_bytes(hashlib.md5(f"mh-b-{i}".encode()).digest()[:8], "big")
        a.append(1 + da % ((1 << 29) - 1))
        b.append(db % MINHASH_P)
    return a, b


def shingle_hash_col(words_expr):
    """32-bit 3-word-shingle hashes WITHOUT building shingle strings:
    each word is md5-hashed once (first 32 bits), consecutive word hashes
    combine arithmetically (h1·P1 + h2·P2 + h3 mod p, reduced to 32 bits).
    Returned as a STAGED pair of projections — the word-hash array is
    materialized under an alias in its own select so Catalyst's project
    collapse does NOT re-inline the md5 transform into every element_at
    reference (inlined, the same plan re-hashes the whole word array per
    shingle position: measured 99 s vs 1.8 s on 100k docs).

    Usage: df2 = docs.select("doc_id", shingle_hash_col(words)) is WRONG —
    call via minhash_signatures / stage helpers below which perform the
    two-step select."""
    return F.transform(
        words_expr,
        lambda w: F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long"),
    )


def _staged_shingle_hashes(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, sh: array<bigint>) — staged projections (see
    shingle_hash_col) so each expensive array is computed once per row."""
    t1 = docs.select("doc_id", shingle_hash_col(words_col(text_col)).alias("wh"))
    comb = lambda i: (  # noqa: E731
        (
            F.element_at(F.col("wh"), i) * MINHASH_P1
            + F.element_at(F.col("wh"), i + 1) * MINHASH_P2
            + F.element_at(F.col("wh"), i + 2)
        )
        % F.lit(MINHASH_P)
    ) % F.lit(MINHASH_M32)
    return t1.select(
        "doc_id",
        F.when(
            F.size("wh") >= 3,
            F.transform(F.sequence(F.lit(1), F.size("wh") - 2), comb),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("sh"),
    )


def minhash_signatures(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    """k-component MinHash over 3-word shingles — ZERO-SHUFFLE rowwise
    form: word md5s → arithmetic shingle combination → per-row array_min
    under each of k affine maps (a_i·h + b_i) mod (2^61−1), the classic
    universal-hash MinHash family (Broder; public literature).

    Profiled at 100k docs / local[8], identical output digests:
    - original (k md5s per shingle string, explode+groupBy): 24.1 s
    - this form (1 md5 per WORD, staged projections, no explode): 1.8 s
    The win is threefold: no shingle-string construction, ~16× less
    hashing (one md5 per word, reused by all 3 shingles it touches, then
    multiply-adds), and no shuffle at all — the signature is a per-row
    computation, so at 100 TB this runs scan-bound in the map stage.
    Docs shorter than 3 words (no shingles) are excluded, matching the
    previous explode+groupBy semantics. Constants and coefficients are
    shared verbatim with the DuckDB oracle (_minhash_cte)."""
    a_c, b_c = minhash_coeffs(k)
    # the shingle-count filter runs on the RAW text BELOW the staged
    # projections: filtering on the staged `sh` alias above them makes
    # predicate pushdown substitute the full array expression into the
    # condition and re-inline the chain (measured 119 s vs 5 s at 100k
    # docs for the identical output — see PLANS.md "Catalyst traps")
    eligible = docs.filter(F.size(words_col()) >= 3)
    staged = _staged_shingle_hashes(eligible)
    return staged.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    F.col("sh"),
                    lambda h: (h * F.lit(a_c[i]) + F.lit(b_c[i])) % F.lit(MINHASH_P),
                )
            ).alias(f"sig_{i}")
            for i in range(k)
        ],
    )


LSH_BAND_CAP = 64  # max docs per (band_idx, band_hash) group that may pair


def _dedup_reps(docs: DataFrame) -> DataFrame:
    """Collapse exact-duplicate texts to one representative doc before
    banding — a mega-cluster of N identical docs would otherwise emit
    O(N²) pairs inside one band. Exact-dup membership is already fully
    reported by exact_dedup; LSH only needs distinct texts."""
    return (
        docs.select(F.md5("text").alias("th"), "doc_id", "text")
        .groupBy("th")
        .agg(F.min("doc_id").alias("doc_id"), F.min("text").alias("text"))
        .select("doc_id", "text")
    )


def _banded(docs: DataFrame, k: int, bands: int) -> DataFrame:
    sig = minhash_signatures(docs, k)
    rows = k // bands
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws("|", *[F.col(f"sig_{b * rows + j}") for j in range(rows)])
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_cols).alias("b")).select(
        "doc_id", F.col("b.band_idx").alias("band_idx"), F.col("b.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    band_cap: int = LSH_BAND_CAP,
) -> DataFrame:
    """MinHash-LSH near-dup candidates: distinct-text docs sharing ≥1
    signature band. Exact dups are collapsed first (see _dedup_reps) and
    any band group still larger than `band_cap` is excluded from pairing —
    the O(n²)-per-band blowup guard. Exclusions are NOT silent: they are
    counted per-run by lsh_band_stats (same banding, same cap)."""
    banded = _banded(_dedup_reps(docs), k, bands)
    sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    ok = banded.join(
        sizes.filter(F.col("n_docs") <= band_cap).select("band_idx", "band_hash"),
        ["band_idx", "band_hash"],
        "left_semi",
    )
    a = ok.alias("a")
    b = ok.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_band_stats(
    docs: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    band_cap: int = LSH_BAND_CAP,
) -> DataFrame:
    """Band-population audit for lsh_candidate_pairs: total band groups,
    the count EXCLUDED by the cap (oversized_bands — the no-silent-
    truncation contract), and the largest group seen."""
    banded = _banded(_dedup_reps(docs), k, bands)
    sizes = banded.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_bands"),
        F.sum(F.when(F.col("n_docs") > band_cap, 1).otherwise(0))
        .cast("long")
        .alias("oversized_bands"),
        F.max("n_docs").alias("max_band_size"),
    )


def lsh_verified_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    band_cap: int = LSH_BAND_CAP,
) -> DataFrame:
    """The verification tier KEYED TO the LSH candidates: exact n-gram
    Jaccard computed only for pairs the bands surfaced (never all-pairs —
    at 100 TB the verify cost is O(candidate pairs), the LSH property).
    Returns (doc_a, doc_b, jaccard) for pairs meeting the threshold."""
    pairs = lsh_candidate_pairs(docs, k, bands, band_cap)
    g = docs.select(
        "doc_id", F.array_distinct(shingles_col(words_col())).alias("grams")
    )
    ga = g.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    gb = g.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    joined = pairs.join(ga, "doc_a").join(gb, "doc_b")
    inter = F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
    union = F.size("grams_a") + F.size("grams_b") - inter
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.round(
                F.when(union > 0, inter.cast("double") / union.cast("double"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash: word hashes vote ±1 per bit; one explode + one
    groupBy with `bits` conditional sums."""
    def bit_sum(b: int):
        return F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        )

    exploded = docs.select("doc_id", F.explode(words_col()).alias("word"))
    w = exploded.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("word")), 1, 15), 16, 10).cast("long").alias("h"),
    )
    agg = w.groupBy("doc_id").agg(
        *[bit_sum(b).alias(f"s_{b}") for b in range(bits)]
    )
    out = agg.select(
        "doc_id",
        sum(
            [
                F.when(
                    F.col(f"s_{b}") > 0, F.shiftleft(F.lit(1).cast("long"), b)
                ).otherwise(F.lit(0).cast("long"))
                for b in range(bits)
            ],
            F.lit(0).cast("long"),
        ).alias("simhash"),
    )
    return out


SIMHASH_BANDS = 4  # 60-bit fp → 4 × 15-bit blocks (pigeonhole: bands > k)
SIMHASH_MAX_HAMMING = 3  # Manku et al. (WWW'07) use k=3 at 64 bits


def _simhash_banded(docs: DataFrame, bits: int, bands: int) -> DataFrame:
    """(doc_id, simhash, band_idx, band_val) over exact-dup-collapsed
    docs — the Hamming-LSH analogue of _banded. The fingerprint rides
    along so the pair join below needs NO join-back (it is one long)."""
    rows = bits // bands
    mask = (1 << rows) - 1
    fp = simhash(_dedup_reps(docs), bits)
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.shiftright(F.col("simhash"), b * rows)
                .bitwiseAND(F.lit(mask))
                .alias("band_val"),
            )
            for b in range(bands)
        ]
    )
    return fp.select("doc_id", "simhash", F.explode(band_cols).alias("b")).select(
        "doc_id",
        "simhash",
        F.col("b.band_idx").alias("band_idx"),
        F.col("b.band_val").alias("band_val"),
    )


def simhash_pairs(
    docs: DataFrame,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    band_cap: int = LSH_BAND_CAP,
) -> DataFrame:
    """SimHash near-dup pairs by Hamming-distance banding — "Detecting
    Near-Duplicates for Web Crawling" (Manku, Jain, Das Sarma, WWW 2007;
    public literature), the web-crawl counterpart of MinHash-LSH: the
    60-bit fingerprint splits into `bands` contiguous blocks; any pair
    within Hamming distance ≤ max_hamming must agree on at least one
    whole block when bands > max_hamming (pigeonhole), so block-equality
    buckets surface EVERY such pair with zero false negatives, and the
    cheap bit_count(xor) verify discards the false positives.

    Same guards as lsh_candidate_pairs: exact-duplicate texts collapse to
    one representative first (_dedup_reps — a mega-cluster would emit
    O(N²) pairs inside one bucket), and any (band_idx, band_val) bucket
    larger than band_cap is excluded from pairing — counted, not silent,
    by simhash_band_stats (same banding, same cap).

    Scale shape: one explode+groupBy corpus pass for the fingerprints
    (simhash), then 4 rows/doc through ONE keyed self-join on
    (band_idx, band_val) — pre-capped so no bucket exceeds band_cap² pair
    work — then the rowwise Hamming verify. Nothing corpus-derived is
    broadcast. Returns (doc_a, doc_b, hamming), doc_a < doc_b."""
    if bands <= max_hamming:
        raise ValueError(
            f"bands ({bands}) must exceed max_hamming ({max_hamming}) "
            "for the pigeonhole no-false-negative guarantee"
        )
    banded = _simhash_banded(docs, bits, bands)
    sizes = banded.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    # both the bucket-size set and the self-join sides are corpus-derived
    # (one row per bucket / 4 rows per doc) — shuffle_hash-hinted so
    # Catalyst's stats-blind estimate never BROADCASTS them (the
    # executor-OOM class VERDICT r4 flagged; plan shape asserted in-test)
    ok = banded.join(
        sizes.filter(F.col("n_docs") <= band_cap)
        .select("band_idx", "band_val")
        .hint("shuffle_hash"),
        ["band_idx", "band_val"],
        "left_semi",
    )
    a = ok.alias("a")
    b = ok.hint("shuffle_hash").alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .distinct()  # fp_a/fp_b are functions of doc_a/doc_b — pair-level dedup
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return pairs.select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def simhash_band_stats(
    docs: DataFrame,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
    band_cap: int = LSH_BAND_CAP,
) -> DataFrame:
    """Bucket-population audit for simhash_pairs (the no-silent-truncation
    contract, mirroring lsh_band_stats): total buckets, buckets excluded
    by the cap, and the largest bucket seen."""
    banded = _simhash_banded(docs, bits, bands)
    sizes = banded.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("n_bands"),
        F.sum(F.when(F.col("n_docs") > band_cap, 1).otherwise(0))
        .cast("long")
        .alias("oversized_bands"),
        F.max("n_docs").alias("max_band_size"),
    )


def ngram_jaccard_adjacent(docs: DataFrame) -> DataFrame:
    """Exact 3-gram Jaccard for the (doc_id, doc_id+1) pair family —
    the verification tier behind the LSH candidates."""
    g = docs.select(
        "doc_id", F.array_distinct(shingles_col(words_col())).alias("grams")
    )
    a = g.alias("a")
    b = g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.grams"), F.col("b.grams")))
    union = F.size(F.col("a.grams")) + F.size(F.col("b.grams")) - inter
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 1)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(
                F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# text analysis family
# ---------------------------------------------------------------------------

TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace + BPE-ish regex token counts per doc."""
    return docs.select(
        "doc_id",
        F.size(words_col()).alias("n_ws_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{TOKEN_REGEX}', 0))").alias(
            "n_regex_tokens"
        ),
    )


def lang_scores(docs: DataFrame) -> DataFrame:
    """Stopword-overlap language-ID heuristic with fixed tie-break order."""
    w = docs.select("doc_id", words_col().alias("ws"))
    scored = w.select(
        "doc_id",
        *[
            F.size(
                F.array_intersect(F.col("ws"), F.array(*[F.lit(s) for s in STOPWORDS[lang]]))
            ).alias(f"s_{lang}")
            for lang in LANGS
        ],
    )
    pred = None
    for lang in LANGS:
        cond = None
        for other in LANGS:
            c = F.col(f"s_{lang}") >= F.col(f"s_{other}")
            cond = c if cond is None else (cond & c)
        pred = (
            F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
        )
    return scored.withColumn("predicted_lang", pred)


def quality_score(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword heuristics → [0,1] quality score."""
    ws = words_col()
    n_words = F.size(ws)
    n_chars = F.length("text")
    n_punct = F.expr("size(regexp_extract_all(text, '[.,;:!?]', 0))")
    stop_all = sorted({s for lst in STOPWORDS.values() for s in lst})
    n_stop = F.size(F.array_intersect(ws, F.array(*[F.lit(s) for s in stop_all])))
    mean_wl = F.when(n_words > 0, n_chars.cast("double") / n_words).otherwise(F.lit(0.0))
    score = (
        F.least(n_words.cast("double") / 100.0, F.lit(1.0)) * 0.4
        + F.least(n_stop.cast("double") / 5.0, F.lit(1.0)) * 0.3
        + F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 0.3).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stop"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Winnowing-style fingerprint: min hash over 5-word rolling windows."""
    sh = docs.select(
        "doc_id", F.explode(shingles_col(words_col(), n=5)).alias("window")
    )
    return sh.groupBy("doc_id").agg(F.min(F.md5("window")).alias("fingerprint"))


# ---------------------------------------------------------------------------
# pipeline curation: benchmark decontamination + deterministic sampling
# ---------------------------------------------------------------------------

def decontaminate(docs: DataFrame, bench: DataFrame, n: int = 3) -> DataFrame:
    """Benchmark decontamination — the train/eval overlap-removal step of a
    training-data pipeline (GPT-3/PaLM-style n-gram decontamination,
    public literature): flag every training doc sharing at least one word
    n-gram with an evaluation/benchmark set, with the count of distinct
    overlapping shingles as evidence.

    Scale shape: the bench side (a benchmark suite — tiny next to 100 TB
    of training text) is reduced to DISTINCT shingle hashes and BROADCAST;
    the training side explodes to (doc_id, shingle_hash) and takes the
    broadcast join with NO pre-distinct (distinct-ing the full corpus
    would be a corpus-wide shuffle — countDistinct after the join touches
    only the colliding rows, with map-side partials). Returns one row per
    CONTAMINATED doc: (doc_id, n_hit_shingles)."""
    tr = docs.select(
        "doc_id", F.explode(shingles_col(words_col(), n=n)).alias("sh")
    ).select("doc_id", F.md5("sh").alias("h"))
    be = (
        bench.select(F.explode(shingles_col(words_col(), n=n)).alias("sh"))
        .select(F.md5("sh").alias("h"))
        .distinct()
    )
    return (
        tr.join(F.broadcast(be), "h")
        .groupBy("doc_id")
        .agg(F.countDistinct("h").cast("bigint").alias("n_hit_shingles"))
    )


def dup_ngram_coverage(docs: DataFrame, n: int = 5) -> DataFrame:
    """Duplicated-n-gram coverage — the per-document substring-duplication
    signal from "Deduplicating Training Data Makes Language Models Better"
    (Lee et al., ACL 2022), in its scalable word-n-gram form: for every
    doc, the fraction of its n-gram INSTANCES whose exact n-gram occurs at
    least twice corpus-wide. Totals count multiplicity, so a doc repeating
    its own n-gram is duplication too (the paper's ExactSubstr would also
    cut self-repeats).

    Scale shape (3 shuffles, all keyed and map-side-combinable — the
    canonical distributed form of this op):
      1. explode → groupBy(doc_id, h): per-doc gram multiplicities
         (in-doc repeats collapse before the wire);
      2. groupBy(h): corpus totals over the already-collapsed rows
         (≤ one row per (doc, distinct gram));
      3. join the gram-cardinality totals back on h (shuffle_hash-hinted:
         totals are corpus-derived, so Catalyst's stats-blind estimate
         may otherwise BROADCAST them — the executor-OOM class VERDICT r4
         flagged in line_dedup/unigram_logprob; the hint also lets
         ReuseExchange dedup the shared per-doc subtree, measured 1.79 s
         vs 2.38 s broadcast at the 15k×2-core tier) + groupBy(doc_id).
    Docs shorter than n words have no n-grams and are absent from the
    output (0/0 is undefined, not 0).

    The gram key is INTERNAL (only counts leave the operator), so it uses
    native xxhash64 — not the md5 cross-engine convention: JVM-vectorized
    (~3× the hash throughput of md5 here, measured in bench/curation.py)
    and an 8-byte long on the shuffle wire instead of a 32-char hex
    string. The DuckDB twin groups by the raw gram string — identical
    results modulo 64-bit collisions: ~2×10⁻⁷ expected at the 3M-gram
    test tier, and at the 10^12-gram design point a few 10⁴ mislabeled
    gram INSTANCES, noise for a duplication-fraction signal."""
    # STAGED projections (the shingle_hash_col discipline): the words
    # array materializes under its own alias first — inlined, Catalyst's
    # project collapse re-evaluates the split/filter per element_at
    # reference inside the shingle transform (measured 18.4 s → 1.1 s for
    # the gram scan at 15k sf0.1 docs × 2 cores).
    t1 = docs.select("doc_id", words_col().alias("ws"))
    grams = t1.select(
        "doc_id", F.explode(shingles_col(F.col("ws"), n=n)).alias("g")
    ).select("doc_id", F.xxhash64("g").alias("h"))
    per_doc = grams.groupBy("doc_id", "h").agg(F.count("*").alias("c"))
    totals = per_doc.groupBy("h").agg(F.sum("c").alias("tot"))
    dup = F.coalesce(F.sum(F.when(F.col("tot") >= 2, F.col("c"))), F.lit(0))
    return (
        per_doc.join(totals.hint("shuffle_hash"), "h")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_grams"),
            dup.cast("bigint").alias("n_dup_grams"),
        )
        .withColumn("dup_frac", F.round(F.col("n_dup_grams") / F.col("n_grams"), 6))
    )


def dup_spans(docs: DataFrame, n: int = 5, tokenizer="ws") -> DataFrame:
    """Maximal duplicated-substring spans — the CUT LIST of Lee et al.'s
    ExactSubstr dedup (ACL 2022) in its scalable word-n-gram form.
    `dup_ngram_coverage` answers "how duplicated is this doc";
    this answers "which token ranges do I remove": for every doc, the
    maximal token intervals covered by n-gram windows whose exact n-gram
    occurs ≥ 2 times corpus-wide (multiplicity counts, so a doc repeating
    its own n-gram is cut too). Overlapping/touching duplicated windows
    merge into one span; a unique gap splits spans (gaps-and-islands).

    Output: (doc_id, span_start, span_end, span_tokens, n_windows) with
    0-based token offsets, end exclusive — the slice a trainer drops
    before packing. Docs with no duplicated window are absent.

    Scale shape (3 keyed shuffles + 1 doc-keyed window, all linear):
      1. posexplode n-gram windows → groupBy(h) instance totals
         (map-side combinable);
      2. left_semi join the (tiny relative to instances) tot≥2 key set
         back on h — shuffle_hash-hinted for the same stats-blindness
         reason as dup_ngram_coverage (corpus-derived right side must
         never be broadcast);
      3. the island scan: ONE window partitioned by doc_id ordered by
         pos — running max(end) then running sum of break flags, both in
         the same window frame family so Catalyst plans a single sort per
         doc partition. Per-doc cardinality is bounded by doc length, so
         the window never sees more than one doc's windows — no skew
         beyond the longest document.
    The gram key is internal (positions, not grams, leave the operator)
    → native xxhash64, same collision arithmetic as dup_ngram_coverage;
    the DuckDB twin groups by the raw gram string."""
    from pyspark.sql import Window

    t1 = docs.select("doc_id", tokens_col(tokenizer=tokenizer).alias("ws"))
    inst = t1.select(
        "doc_id", F.posexplode(shingles_col(F.col("ws"), n=n)).alias("pos", "g")
    ).select("doc_id", "pos", F.xxhash64("g").alias("h"))
    dup_keys = (
        inst.groupBy("h").agg(F.count("*").alias("tot"))
        .where(F.col("tot") >= 2)
        .select("h")
    )
    d = inst.join(dup_keys.hint("shuffle_hash"), "h", "left_semi")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    isl = d.withColumn(
        "brk",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn("island", F.sum("brk").over(w))
    return (
        isl.groupBy("doc_id", "island")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + n).cast("bigint").alias("span_end"),
            F.count("*").cast("bigint").alias("n_windows"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
            "n_windows",
        )
    )


def exactsubstr_cut(docs: DataFrame, n: int = 5, tokenizer="ws") -> DataFrame:
    """Apply the `dup_spans` cut list — the actual ExactSubstr
    TRANSFORMATION of Lee et al. (ACL 2022): every token inside a
    duplicated span is removed and the survivors are re-joined, giving
    the deduplicated text a trainer packs. One row per input doc:
    (doc_id, text_cut, n_tokens_kept, n_tokens_cut); docs without
    duplicated spans pass through whole (n_tokens_cut = 0), fully-
    duplicated docs come back empty.

    Scale shape on top of dup_spans' (3 keyed shuffles + doc window):
    one doc-keyed groupBy folds a doc's spans into an array (bounded by
    tokens/n per doc), then ONE doc-keyed join back to the corpus —
    shuffle_hash-hinted because the span side is corpus-derived (the
    broadcast-OOM class again). The cut itself is per-row codegen: a
    two-arg higher-order filter probing the span array (spans per doc
    are few, and the probe is branch-local — no explode, no second
    shuffle)."""
    spans = dup_spans(docs, n=n, tokenizer=tokenizer)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("spans")
    )
    t1 = docs.select("doc_id", tokens_col(tokenizer=tokenizer).alias("ws"))
    empty = F.array().cast("array<struct<span_start:bigint,span_end:bigint>>")
    j = t1.join(per_doc.hint("shuffle_hash"), "doc_id", "left").select(
        "doc_id", "ws", F.coalesce("spans", empty).alias("spans")
    )
    kept = F.filter(
        F.col("ws"),
        lambda w, i: ~F.exists(
            F.col("spans"),
            lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
        ),
    )
    return j.select(
        "doc_id",
        F.concat_ws(" ", kept).alias("text_cut"),
        F.size(kept).cast("bigint").alias("n_tokens_kept"),
        (F.size("ws") - F.size(kept)).cast("bigint").alias("n_tokens_cut"),
    )


def hash_sample(docs: DataFrame, cutoffs: dict[str, int], default: int = 0,
                salt: str = "smp") -> DataFrame:
    """Deterministic per-source stratified sampling — the mix-weighting
    step of a training-data pipeline (down-sample low-quality sources,
    keep high-quality ones whole) with NO RNG state: membership is a pure
    function of doc_id, so the sample is reproducible across runs,
    cluster sizes, and engines.

    `cutoffs` maps source → keep-threshold in 1/256 steps (256 = keep
    all); a doc survives iff its first md5 byte (as two hex chars, compared
    LEXICOGRAPHICALLY — identical semantics in any engine with md5 and
    string compare, no hex→int conversion needed) is below the cutoff.
    One scan, no shuffle, no sort: the predicate is computed, so it
    evaluates inside the scan stage's codegen (not parquet-pushed — only
    doc_id and source are read) and the output is the surviving
    (doc_id, source) rows."""
    bucket = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#" + salt))), 1, 2
    )
    thresh = None
    for src, cut in sorted(cutoffs.items()):
        hex2 = format(min(max(cut, 0), 256) , "03x")[-2:] if cut < 256 else "zz"
        # 256 -> 'zz' sorts above every hex pair = keep all
        cond = F.col("source") == src
        t = F.lit(hex2)
        thresh = F.when(cond, t) if thresh is None else thresh.when(cond, t)
    thresh = (
        thresh.otherwise(F.lit(format(min(max(default, 0), 255), "02x")))
        if thresh is not None
        else F.lit(format(min(max(default, 0), 255), "02x"))
    )
    return docs.select("doc_id", "source", bucket.alias("bucket2")).filter(
        F.col("bucket2") < thresh
    ).select("doc_id", "source")


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Repetitiousness quality signals (Gopher-style filtering rules,
    public literature): fraction of duplicated word 2-grams inside each
    doc and the frequency share of the doc's most common word — both
    strong boilerplate/low-quality indicators in training-data curation.
    Word identity is by 32-bit md5 word hash (identical in the oracle;
    cross-word collisions ~n²/2^32 per doc — negligible and
    engine-identical).

    Scale shape — ZERO SHUFFLE (profiled at 100k docs / local[8]): the
    original string-2-gram + explode/groupBy form measured 34.5 s with
    the 2-gram STRING construction alone at 28.1 s; this form hashes
    words once (staged projection — see shingle_hash_col on why staging
    matters), derives 2-gram hashes arithmetically (1.1 s), and computes
    the top-word count per row as the longest run in the sorted word-hash
    array (1.4 s, value-identical to the explode+groupBy aggregate) —
    everything is per-row codegen in the map stage."""
    t1 = docs.select("doc_id", shingle_hash_col(words_col()).alias("wh"))
    two_h = F.when(
        F.size("wh") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("wh") - 1),
            lambda i: (
                F.element_at(F.col("wh"), i) * MINHASH_P1
                + F.element_at(F.col("wh"), i + 1)
            )
            % F.lit(MINHASH_P),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    t2 = t1.select(
        "doc_id", F.size("wh").alias("n_words"), two_h.alias("tg"),
        F.array_sort("wh").alias("swh"),
    )
    top_run = F.aggregate(
        F.col("swh"),
        F.struct(
            F.lit(-1).cast("long").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0).cast("long").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    t3 = t2.select(
        "doc_id",
        "n_words",
        F.size("tg").alias("n_2grams"),
        (F.size("tg") - F.size(F.array_distinct("tg"))).alias("n_dup_2grams"),
        top_run.alias("top_word_count"),
    )
    return t3.select(
        "doc_id",
        "n_2grams",
        "n_dup_2grams",
        F.round(
            F.when(
                F.col("n_2grams") > 0,
                F.col("n_dup_2grams").cast("double") / F.col("n_2grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_2gram_frac"),
        F.col("top_word_count").cast("bigint").alias("top_word_count"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.col("top_word_count").cast("double") / F.col("n_words"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("top_word_frac"),
    )


# ---------------------------------------------------------------------------
# pipeline curation: PII scrubbing + boilerplate line removal + corpus mix
# ---------------------------------------------------------------------------

# Patterns restricted to the regex subset Java (Spark) and RE2 (DuckDB)
# share bit-for-bit: char classes, bounded repeats, \b — no lookaround, no
# backrefs. Order matters for redaction: emails first (an email contains
# no digits runs long enough to collide with the number pattern on this
# corpus, but keeping a fixed order makes the composition deterministic).
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_IPV4 = "\\b[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}\\b"
PII_LONGNUM = "\\b[0-9][0-9 -]{6,}[0-9]\\b"


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction — the privacy-scrub step of a
    training-data pipeline (public practice: regex classes for emails /
    IP addresses / long digit runs, cf. the C4 and BigScience/ROOTS
    pipelines' published PII filters): per-doc match counts for each
    class plus the md5 of the redacted text (emails → <EMAIL>, IPv4 →
    <IP>, remaining 8+-digit runs → <NUM>, applied in that fixed order).

    Counts are PROGRESSIVE — each class is counted on the text with the
    previous classes already redacted (emails on the raw text, IPv4 on the
    email-redacted text, long numbers on the IP-redacted text) — so the
    three counts always sum to the number of redactions actually applied:
    a token matching two classes (a long digit run inside an email local
    part) is counted once, in the class that redacted it.

    Scale shape: pure per-row JVM regex inside codegen — one scan, no
    shuffle, no UDF; the md5 keeps the checked output compact while still
    pinning every redacted byte. The r1/r2 intermediates are staged in
    their own selects so the multi-referenced replace chains are not
    re-inlined by project collapse (PLANS.md "Catalyst traps")."""
    s1 = docs.select("doc_id", F.col(text_col).alias("t"))
    s2 = s1.select(
        "doc_id", "t", F.regexp_replace("t", PII_EMAIL, "<EMAIL>").alias("r1")
    )
    s3 = s2.select(
        "doc_id", "t", "r1", F.regexp_replace("r1", PII_IPV4, "<IP>").alias("r2")
    )
    return s3.select(
        "doc_id",
        F.regexp_count(F.col("t"), F.lit(PII_EMAIL)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("r1"), F.lit(PII_IPV4)).cast("bigint").alias("n_ipv4"),
        F.regexp_count(F.col("r2"), F.lit(PII_LONGNUM))
        .cast("bigint")
        .alias("n_longnums"),
        F.md5(F.regexp_replace("r2", PII_LONGNUM, "<NUM>")).alias("clean_md5"),
    )


# Corpus-DERIVED small sides (boilerplate-line set, pruned vocabulary) are
# only "small" by assumption — web-scale corpora break it (10^9+ distinct
# boilerplate lines / vocab tokens). Same auto-mode discipline as
# config.bloom_broadcast_max_bytes: broadcast-hint the side only while its
# measured row count stays under this cap (~64 B/row for an md5-hash or
# token row → ~64 MB, the bloom chain's ceiling); above it the join runs
# un-hinted (shuffle left_anti / shuffle join — same operator minus the
# hint, digest-identical, tested both ways). README "auto-selection" table.
BROADCAST_MAX_ROWS = 1_000_000


def _gated_broadcast(small: DataFrame, mode: bool | None, max_rows: int):
    """Apply F.broadcast per `mode`: True/False force; None measures.
    The measuring count persists `small` first so the decision job's work
    is reused by the consuming join instead of recomputed."""
    if mode is None:
        from pyspark import StorageLevel

        small = small.persist(StorageLevel.MEMORY_AND_DISK)
        mode = small.count() <= max_rows
    return F.broadcast(small) if mode else small


def line_dedup(
    docs: DataFrame,
    min_df: int = 3,
    text_col: str = "text",
    broadcast_common: bool | None = None,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Corpus-frequency boilerplate line removal (CCNet-style paragraph
    dedup, public literature): every newline-separated line whose
    document frequency reaches `min_df` is dropped from every doc;
    returns per-doc (doc_id, n_lines, n_kept, clean_md5) where clean_md5
    pins the surviving lines rejoined in original order.

    Scale shape: lines explode once; the document-frequency aggregate is
    a map-side-combined count over (line_hash) after a per-doc distinct
    (same shuffle class, keyed on the hash so it is uniform). The removal
    join broadcasts the ≥min_df line set only while it MEASURES small
    (`broadcast_common=None` counts it against `broadcast_max_rows`;
    True/False force a mode) — "boilerplate is few" fails on web-scale or
    duplicate-heavy corpora, where the un-hinted shuffle left_anti takes
    over instead of OOMing executors. Reassembly sorts each doc's
    surviving (pos, line) structs in-array (array_sort, no window) —
    per-row work, no second shuffle."""
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "")
    exploded = docs.select(
        "doc_id", F.posexplode(lines).alias("pos", "line")
    ).withColumn("h", F.md5("line"))
    df_counts = (
        exploded.select("doc_id", "h")
        .distinct()
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    common = df_counts.filter(F.col("df") >= min_df).select("h")
    kept = exploded.join(
        _gated_broadcast(common, broadcast_common, broadcast_max_rows),
        "h",
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("clean"),
    )
    totals = docs.select(
        "doc_id", F.size(lines).alias("n_lines")
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
            F.md5(F.coalesce(F.col("clean"), F.lit(""))).alias("clean_md5"),
        )
    )


def hashed_tfidf(docs: DataFrame, dim: int = 64, text_col: str = "text") -> DataFrame:
    """Feature-hashing TF-IDF document vectors (the hashing trick —
    Weinberger et al., ICML 2009; public literature), SPARSE form: one
    row per (doc_id, bucket) with the signed, L2-normalized weight. This
    is the seam that lets the ANN / semantic-dedup family run on a TEXT
    corpus with no external embedder: pivot the sparse rows to an
    array<double> (collect by bucket per doc — bounded by `dim`) and the
    vector drops into ann_bruteforce_topk / simsearch unchanged.

    Per word: bucket = md5(word)[0:8] mod dim, sign = md5(word)[8] bit —
    the standard unbiased signed hash; w(doc, bucket) = Σ sign · tf ·
    idf over colliding words, idf = ln((N+1)/(df+1)) + 1 (sklearn's
    smooth form, public), then each doc divides by its L2 norm. md5 is
    the cross-engine hash convention, so the DuckDB twin reproduces
    buckets, signs, and weights bit-for-bit (round 6).

    Scale shape (round 8): ONE explode — tf is a map-side-combined
    (doc_id, word) aggregate and df is a COUNT WINDOW over the word key
    on those same rows, so the corpus is exploded and shuffled exactly
    once (plan-asserted: a single Generate in the executedPlan). The
    round-7 form computed df as a separate aggregate re-joined on word;
    column pruning made that subtree non-canonical with the weighted
    side, so exchange reuse never fired and the explode ran twice — the
    window removes both the second explode and the word-keyed join. Key
    distribution is unchanged (the old shuffle_hash join clustered the
    same tf rows by the same word key), so hot-word skew exposure is
    identical. N is a 1-row broadcast; the bucket aggregate and the
    L2-norm join are doc-keyed; nothing corpus-derived is broadcast.
    Docs whose weights fully cancel (ssq = 0, exact — squares are
    order-proof) are dropped."""
    return _hashed_tfidf_vecs(
        _tf_frame(docs, text_col), _ndocs_frame(docs), dim
    )


def _tf_frame(docs: DataFrame, text_col: str) -> DataFrame:
    """The hashed-TF-IDF family's ONE corpus pass: per-(doc, word) term
    counts from a single explode (shared by hashed_tfidf and
    topic_scores so the family never re-tokenizes the corpus)."""
    return (
        docs.select("doc_id", F.explode(words_col(text_col)).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def _ndocs_frame(docs: DataFrame) -> DataFrame:
    return docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))


def _hashed_tfidf_vecs(tf: DataFrame, n1: DataFrame, dim: int) -> DataFrame:
    from pyspark.sql import Window as _W

    bucket = (
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long") % dim
    ).alias("bucket")
    sign = F.when(
        F.conv(F.substring(F.md5("word"), 9, 1), 16, 10).cast("long") % 2 == 1,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    idf = F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    # df = rows per word over the SAME tf rows (one (doc,word) row per
    # containing doc, so the count IS the document frequency)
    withdf = tf.withColumn(
        "df", F.count(F.lit(1)).over(_W.partitionBy("word"))
    )
    weighted = (
        withdf.crossJoin(F.broadcast(n1))
        .select(
            "doc_id", bucket, (sign * F.col("tf") * idf).alias("wt")
        )
    )
    per_bucket = weighted.groupBy("doc_id", "bucket").agg(
        F.sum("wt").alias("w_raw")
    )
    # L2 norm as a doc-keyed window over the per-bucket rows (≤dim per
    # doc): referencing per_bucket ONCE keeps the plan a single chain —
    # the round-7 groupBy+self-join referenced it twice, and exchange
    # reuse does not reliably deduplicate the subtree once this operator
    # is composed into a larger query (topic_scores paid a second full
    # corpus explode through exactly that gap)
    ssq = F.sum(F.col("w_raw") * F.col("w_raw")).over(
        _W.partitionBy("doc_id")
    )
    return (
        per_bucket.withColumn("ssq", ssq)
        .filter(F.col("ssq") > 0)
        .select(
            "doc_id",
            "bucket",
            F.round(F.col("w_raw") / F.sqrt("ssq"), 6).alias("w"),
        )
    )


def topic_scores(
    docs: DataFrame, topic: str, dim: int = 64, text_col: str = "text"
) -> DataFrame:
    """Focused-crawl page relevance (Chakrabarti, van den Berg, Dom,
    "Focused crawling", WWW 1999; public literature): cosine similarity
    of every document's hashed-TF-IDF vector against a TOPIC string
    vectorized in the same space — the page-level score a focused
    crawler feeds its frontier priority (compose with
    pagerank_boosts_df over score-as-pr for the boosts_df seam, the
    host_opic hand-off).

    The topic uses the CORPUS idf (standard: query-side weights come
    from collection statistics): topic words missing from the corpus
    carry df = 0 → smooth idf of ln(N+1)+1. Both sides L2-normalize, so
    the score is the dot product over shared buckets — a doc whose
    vector has NO bucket in common with the topic is omitted from the
    output (consumers treat absence as 0.0), as is a doc whose weights
    fully cancel: (doc_id, topic_cos), rounded 6.

    Scale shape (round 8): the corpus side is hashed_tfidf built from
    the shared _tf_frame single-pass form (one explode, window df — see
    hashed_tfidf). The topic-side idf needs df for ≤k topic words only,
    so its aggregate is broadcast-semi-filtered to those words BEFORE
    any shuffle — the round-7 form re-exploded the corpus into a FULL
    (doc_id, word) exchange plus a full word exchange just to read ≤k
    df values; now only the matching rows (docs containing a topic
    word) leave the map side. The topic vector is a ≤dim-row frame —
    broadcast by construction; the score is one bucket-keyed join with
    that tiny frame + one doc-keyed aggregate."""
    words = [w for w in topic.lower().split(" ") if w]
    if not words:
        raise ValueError("topic must contain at least one word")
    tf = _tf_frame(docs, text_col)
    n1 = _ndocs_frame(docs)
    vecs = _hashed_tfidf_vecs(tf, n1, dim)
    spark = docs.sparkSession
    t_tf = spark.createDataFrame(
        [(w, c) for w, c in sorted(Counter(words).items())],
        "word string, tf long",
    )
    # df restricted to the topic's words: count the tf rows (one per
    # containing doc) that survive a broadcast semi-join on the ≤k-word
    # set — identical values to the full-vocabulary df for those words
    dfreq = (
        tf.join(F.broadcast(t_tf.select("word")), "word", "semi")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    bucket = (
        F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long") % dim
    ).alias("bucket")
    sign = F.when(
        F.conv(F.substring(F.md5("word"), 9, 1), 16, 10).cast("long") % 2 == 1,
        F.lit(1.0),
    ).otherwise(F.lit(-1.0))
    idf = F.log(
        (F.col("n_docs") + 1.0) / (F.coalesce(F.col("df"), F.lit(0)) + 1.0)
    ) + 1.0
    t_raw = (
        t_tf.join(dfreq, "word", "left")
        .crossJoin(F.broadcast(n1))
        .select(bucket, (sign * F.col("tf") * idf).alias("wt"))
        .groupBy("bucket")
        .agg(F.sum("wt").alias("t_raw"))
    )
    # L2-normalize via ONE global window over the ≤dim-row topic frame:
    # the round-7 agg + crossJoin referenced t_raw twice, duplicating
    # the whole topic subtree (and its corpus pass) in the plan — the
    # window reads it once, and a single partition of ≤dim rows is free
    from pyspark.sql import Window as _W

    t_ssq = F.sum(F.col("t_raw") * F.col("t_raw")).over(_W.partitionBy())
    t_vec = t_raw.select(
        "bucket", (F.col("t_raw") / F.sqrt(t_ssq)).alias("t_w")
    )
    return (
        vecs.join(F.broadcast(t_vec), "bucket")
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("w") * F.col("t_w")), 6).alias("topic_cos"))
    )


def boilerplate_cut(
    docs: DataFrame,
    group_col: str = "source",
    min_df: int = 3,
    min_frac: float = 0.5,
    text_col: str = "text",
    broadcast_common: bool | None = None,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """PER-SOURCE template removal (the RefinedWeb / CCNet site-template
    discipline, public literature): a line is boilerplate WITHIN its
    group (site/source) when it appears in ≥ min_df of the group's docs
    AND in ≥ min_frac of them — nav menus, footers, cookie banners. This
    is the signal corpus-wide ``line_dedup`` structurally cannot see at
    web scale: a footer on 100% of one site's pages is boilerplate there
    while sitting far below any global document-frequency bar, and a
    quote carried by 1-in-7 docs of EVERY source clears a global min_df
    while being template on none of them (both regimes planted in the
    driver query). Returns one row per doc: (doc_id, <group_col>,
    n_lines, n_kept, clean_md5) — the line_dedup output contract with
    the group carried through.

    Scale shape (the line_dedup skeleton, keyed by (group, line_hash)):
    lines explode once; the per-group document-frequency aggregate is
    map-side-combined over a per-doc distinct; the group-size join is
    group-cardinality. The boilerplate (group, h) set is corpus-derived,
    so the removal join broadcasts it only while it MEASURES small
    (_gated_broadcast) — oversized template sets fall back to the
    shuffle left_anti instead of OOMing executors. Reassembly is the
    same in-array array_sort, per-row, no second shuffle. The min_frac
    bar is evaluated as ``df >= min_frac * n_docs`` in doubles with the
    IDENTICAL expression shape in the DuckDB twin, so both engines make
    the same keep/drop call on boundary groups."""
    lines = F.filter(F.split(F.col(text_col), "\n"), lambda x: x != "")
    exploded = docs.select(
        "doc_id", group_col, F.posexplode(lines).alias("pos", "line")
    ).withColumn("h", F.md5("line"))
    group_totals = docs.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    df_counts = (
        exploded.select(group_col, "doc_id", "h")
        .distinct()
        .groupBy(group_col, "h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    common = (
        df_counts.join(group_totals, group_col)
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") >= F.lit(float(min_frac)) * F.col("n_docs"))
        )
        .select(group_col, "h")
    )
    kept = exploded.join(
        _gated_broadcast(common, broadcast_common, broadcast_max_rows),
        [group_col, "h"],
        "left_anti",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("clean"),
    )
    totals = docs.select("doc_id", group_col, F.size(lines).alias("n_lines"))
    return totals.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        group_col,
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        F.md5(F.coalesce(F.col("clean"), F.lit(""))).alias("clean_md5"),
    )


def corpus_mix(docs: DataFrame, tokenizer="ws") -> DataFrame:
    """Training-mix accounting: per-source doc / token / char totals and
    each source's token share of the corpus — the numbers a mix-weighting
    step (hash_sample cutoffs) is derived from. ``tokenizer`` selects the
    token budget's unit (tokens_col seam); the default is plan-identical
    to the pre-seam form.

    Scale shape: one map-side-combined groupBy on `source` (cardinality =
    number of sources, tiny); the share denominator is a window sum over
    the already-aggregated rows, so the corpus is scanned exactly once."""
    from pyspark.sql import Window

    agg = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens_col(tokenizer=tokenizer))).cast("bigint").alias("n_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return agg.select(
        "source",
        "n_docs",
        "n_tokens",
        "n_chars",
        F.round(F.col("n_tokens").cast("double") / total, 6).alias("token_share"),
    )


def mix_weights(docs: DataFrame, alpha: float = 0.3, tokenizer="ws") -> DataFrame:
    """Temperature-scaled sampling weights per corpus source — the
    exponentiated-share mixing rule multilingual LM training uses to keep
    low-resource sources from vanishing (XLM-R / multilingual-BERT,
    alpha≈0.3; alpha=1 recovers natural proportions, alpha→0 uniform):

        weight_s = share_s^alpha / Σ_t share_t^alpha

    plus the implied per-doc ``upsample_factor`` = weight_s / share_s (the
    expected repeat count of a source's docs when sampling the mixed
    corpus at natural size) — the two numbers a data loader's sampler is
    configured from.

    Scale shape: corpus_mix's single scan + tiny source-cardinality
    aggregate; the two normalizations are window sums over the aggregated
    rows only (source-cardinality, the repo's metadata-window class).
    round(·,6) at the output, repo float convention."""
    from pyspark.sql import Window

    w = Window.partitionBy()
    mixed = corpus_mix(docs, tokenizer=tokenizer).withColumn(
        "_pow",
        F.pow(
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(w),
            F.lit(float(alpha)),
        ),
    )
    weight = F.col("_pow") / F.sum("_pow").over(w)
    return mixed.select(
        "source",
        "n_docs",
        "n_tokens",
        "token_share",
        F.round(weight, 6).alias("weight"),
        F.round(
            weight / (F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)),
            6,
        ).alias("upsample_factor"),
    )


def token_shards(
    docs: DataFrame,
    budget: int = 4096,
    bucket_width: int | None = None,
    tokenizer="ws",
) -> DataFrame:
    """Token-budget sharding — the sequence-packing / shard-boundary step
    of a training-data pipeline: docs in deterministic doc_id order are
    cut into contiguous shards of ~`budget` tokens; each doc reports its
    running token total and the shard its first token lands in.

    A naive global cumulative sum is a single-partition window (the W5
    scale-killer). Instead, the classic two-pass prefix sum: (1) bucket =
    doc_id div `bucket_width`; per-bucket token sums are one map-side-
    combined aggregate whose result is TINY (n_docs / bucket_width rows);
    their EXCLUSIVE prefix is a window over that aggregate only (rows
    unbounded-preceding..-1 ordered by bkt — single partition, but of
    ≈N/bucket_width rows, never the corpus), broadcast-joined back;
    (2) the heavy cumulative window runs PER BUCKET (parallel, bounded
    partitions) and adds the bucket offset. Output is identical to the
    global window at any parallelism, and — unlike a collected offset
    dict — the whole plan is LAZY and self-consistent under re-evaluation
    (no value frozen at construction time).

    `bucket_width=None` derives ≈√N from one cheap count (an O(1)-result
    job at call time; the width only shapes the plan — output values are
    width-invariant), keeping BOTH the offset table and each per-bucket
    window at √N rows: at the 10^10-doc design point that is ~10^5 offset
    rows, not the 4×10^7 a fixed width of 256 would produce."""
    if bucket_width is None:
        import math

        bucket_width = max(16, math.isqrt(max(int(docs.count()), 1)))
    tokens = docs.select(
        "doc_id",
        F.size(tokens_col(tokenizer=tokenizer)).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") / bucket_width).cast("bigint").alias("bkt"),
    )
    from pyspark.sql import Window

    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    off_df = F.broadcast(
        tokens.groupBy("bkt")
        .agg(F.sum("n_tokens").alias("s"))
        .select(
            "bkt",
            F.coalesce(F.sum("s").over(w_off), F.lit(0)).cast("bigint").alias("off"),
        )
    )
    w = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = tokens.join(off_df, "bkt").select(
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) + F.col("off")).alias("cum_tokens"),
    )
    return cum.select(
        "doc_id",
        "n_tokens",
        "cum_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget)
        .cast("bigint")
        .alias("shard_id"),
    )


def _md5_hex_byte(key, salt: str) -> "F.Column":
    """First md5 byte of ``key || '#salt'`` as 0..255 — via two hex-char
    lookups in '0123456789abcdef', the one int-from-hash construction both
    engines share bit-for-bit (DuckDB has no xxhash64/conv; strpos/instr +
    substring are identical)."""
    h = f"md5(concat(cast({key} as string), '#{salt}'))"
    hx = "'0123456789abcdef'"
    return F.expr(
        f"(instr({hx}, substring({h}, 1, 1)) - 1) * 16"
        f" + instr({hx}, substring({h}, 2, 1)) - 1"
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int = 2048,
    n_shards: int | None = None,
    salt: str = "pack",
    tokenizer="ws",
) -> DataFrame:
    """GPT-style sequence packing (concat-and-chunk): documents are
    pseudo-shuffled deterministically, concatenated per shard, and cut
    every ``context_len`` tokens; each doc reports the pack its first
    token lands in, its offset inside that pack, and whether it straddles
    a pack boundary (the rows a loss-masking loader treats specially).

    Unlike ``token_shards`` (contiguous doc_id order — shard-boundary
    accounting), packing wants the TRAINING order: a deterministic
    hash-derived permutation (md5 of doc_id — no RNG state, identical at
    any parallelism and in any engine), sharded so the per-shard window
    sort is the only non-mapside step.

    Scale shape: shard = first md5 byte mod ``n_shards`` ⇒ each window
    partition holds ≈N/n_shards rows; the sort per partition is the
    irreducible cost of sequencing. ``n_shards=None`` (default) derives
    ≈√N from one cheap count — the token_shards discipline
    (``token_shards`` bucket_width): shard count and rows-per-shard both
    stay at √N, so at the 10^10-doc design point that is ~10^5 shards of
    ~10^5 rows, never an N/8-row single-executor sort (a fixed default of
    8 would put ~1.2×10^9 rows on one window partition there). The DuckDB
    twin derives the same value via FLOOR(SQRT(COUNT(*))) — IEEE sqrt is
    correctly rounded, so the two engines agree for any N below ~4×10^15.
    Passing n_shards explicitly keeps construction job-free (lazy). No
    global window, no driver state. Docs with 0 tokens get offset rows
    but never cross."""
    from pyspark.sql import Window

    if n_shards is None:
        import math

        n_shards = max(1, math.isqrt(max(int(docs.count()), 1)))
    t = docs.select(
        "doc_id",
        F.size(tokens_col(tokenizer=tokenizer)).cast("bigint").alias("n_tokens"),
        (_md5_hex_byte("doc_id", salt + "shard") % n_shards)
        .cast("int")
        .alias("shard"),
        F.expr("substring(md5(concat(cast(doc_id as string), '#ord')), 1, 8)").alias(
            "ordkey"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("ordkey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = t.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("cum_before"),
    )
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(F.col("cum_before") / context_len).cast("bigint").alias("pack_id"),
        (F.col("cum_before") % context_len).cast("bigint").alias("offset_in_pack"),
        (
            (F.col("n_tokens") > 0)
            & (
                F.floor((F.col("cum_before") + F.col("n_tokens") - 1) / context_len)
                > F.floor(F.col("cum_before") / context_len)
            )
        ).alias("crosses_boundary"),
    )


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-doc feature vector for the trained quality tier: length,
    word-shape, stopword, punctuation, and repetition signals — all pure
    JVM, one scan + the repetition_stats aggregate pair."""
    ws = words_col()
    n_words = F.size(ws).cast("double")
    n_chars = F.length("text").cast("double")
    stop_all = sorted({s for lst in STOPWORDS.values() for s in lst})
    n_stop = F.size(F.array_intersect(ws, F.array(*[F.lit(s) for s in stop_all])))
    base = docs.select(
        "doc_id",
        n_words.alias("f_words"),
        F.when(n_words > 0, n_chars / n_words).otherwise(F.lit(0.0)).alias("f_mwl"),
        F.when(n_words > 0, n_stop.cast("double") / n_words)
        .otherwise(F.lit(0.0))
        .alias("f_stop"),
        F.when(
            n_chars > 0,
            F.expr("size(regexp_extract_all(text, '[.,;:!?]', 0))").cast("double")
            / n_chars,
        )
        .otherwise(F.lit(0.0))
        .alias("f_punct"),
    )
    rep = repetition_stats(docs).select("doc_id", "dup_2gram_frac", "top_word_frac")
    return base.join(rep, "doc_id").select(
        "doc_id",
        F.array("f_words", "f_mwl", "f_stop", "f_punct",
                "dup_2gram_frac", "top_word_frac").alias("features"),
    )


def quality_classifier_scores(
    docs: DataFrame, threshold: float = 0.6, seed: int = 42, max_iter: int = 50
) -> DataFrame:
    """Trained quality filter (the CCNet/GPT-3-style learned tier behind
    the heuristic): weak labels come from the rule-based quality_score
    (≥ `threshold` → positive), a seeded MLlib LogisticRegression fits the
    quality_features vector, and every doc gets a model probability +
    prediction: (doc_id, label, prob, pred).

    Same split as the trained IVF codebook (simsearch.kmeans_codebook):
    the heuristic stays the deterministic SQL-oracle tier; the trained
    model is pytest-tier (agreement asserted, not SQL-reproducible).
    Scale: training aggregates gradients tree-wise on executors (MLlib);
    scoring is a broadcast of the coefficient vector."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    labels = quality_score(docs).select(
        "doc_id", (F.col("quality") >= threshold).cast("double").alias("label")
    )
    raw = quality_features(docs).join(labels, "doc_id")
    feats = raw.select(
        "doc_id", array_to_vector("features").alias("features"), "label"
    )
    lr = LogisticRegression(maxIter=max_iter, regParam=0.01, standardization=True)
    model = lr.fit(feats)
    # score with the COEFFICIENT VECTOR as plain column arithmetic instead
    # of model.transform: the fitted model's training summary holds the
    # SparkSession (BinaryLogisticRegressionTrainingSummaryImpl), and
    # serializing the model into the transform closure fails with
    # "Task not serializable: ObservationManager" whenever the session's
    # observation registry is non-empty (Spark 4.1). Expression scoring is
    # also the honest scale shape -- w and b broadcast as literals, the
    # sigmoid runs in codegen.
    w = [float(x) for x in model.coefficients.toArray()]
    b = float(model.intercept)
    margin = F.lit(b)
    for i, wi in enumerate(w):
        margin = margin + F.lit(wi) * F.element_at(F.col("features"), i + 1)
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
    return raw.select(
        "doc_id",
        "label",
        F.round(prob, 6).alias("prob"),
        F.when(prob > 0.5, F.lit(1.0)).otherwise(F.lit(0.0)).alias("pred"),
    )


# ---------------------------------------------------------------------------
# URL-level quality filtering (C4-style, public practice)
# ---------------------------------------------------------------------------

URL_TRACKING = "utm_[a-z]+="
URL_BLOCKLIST = "/casino/|/poker/"
URL_MEDIA_EXTS = ["jpg", "jpeg", "png", "gif", "mp4", "webm", "mp3"]


def url_quality(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level quality features — the pre-fetch / pre-train filter pass
    a web pipeline runs on URLs alone (C4 and similar pipelines filter by
    URL blocklists, tracking junk, and media extensions before touching
    content): path depth, query-parameter count, tracking-parameter flag,
    extension class, and a path-keyword blocklist hit.

    Pure per-row string/regex ops in codegen (Java∩RE2 subset) — one
    scan, no shuffle; composes with any frontier or document-URL table."""
    u = F.col(url_col)
    path_part = F.substring_index(u, "?", 1)
    # query = everything after the FIRST '?' (URL semantics; a second '?'
    # is part of the query, so 'a?b=1&c=2?d=3' has params [b=1, c=2?d=3]);
    # empty on no-'?' and on a bare trailing '?', both of which count 0
    query = F.regexp_extract(u, "[?](.*)", 1)
    ext = F.lower(F.regexp_extract(path_part, "[.]([A-Za-z0-9]{1,5})$", 1))
    return urls.select(
        url_col,
        (F.size(F.split(path_part, "/")) - 3).cast("bigint").alias("path_depth"),
        F.when(F.length(query) > 0, F.size(F.split(query, "&")))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_query_params"),
        (F.regexp_count(u, F.lit(URL_TRACKING)) > 0).alias("has_tracking"),
        F.when(ext.isin(URL_MEDIA_EXTS), F.lit("media"))
        .when(ext == "", F.lit("page"))
        .otherwise(F.lit("page"))
        .alias("ext_class"),
        (F.regexp_count(path_part, F.lit(URL_BLOCKLIST)) > 0).alias("blocklisted"),
    )


# Multi-label public suffixes (a small embedded subset of the public
# suffix list — the high-traffic two-label registries; production swaps in
# the full publicsuffix.org snapshot, the expression shape is unchanged).
MULTI_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.br", "net.br", "org.br", "gov.br",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "co.kr", "or.kr", "com.mx", "com.ar", "com.tr", "com.tw",
    "co.za", "co.nz", "com.sg", "com.hk",
)


def registered_domain(host_col) -> "F.Column":
    """eTLD+1 (registered domain) of a hostname — the grouping key for
    per-domain corpus mixing, quotas, and dedup attribution: the last two
    labels, or the last THREE when the final two form a multi-label public
    suffix (MULTI_SUFFIXES). Pure codegen (split + element_at + concat):
    no UDF, no shuffle. IP literals and single-label hosts pass through
    unchanged."""
    parts = F.split(host_col, "[.]")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2), F.element_at(parts, -1)
    )
    return (
        F.when(n <= 2, host_col)
        .when((n >= 3) & F.lower(last2).isin(*MULTI_SUFFIXES), last3)
        .otherwise(last2)
    )


def registered_domain_py(host: str) -> str:
    """Pure-Python twin of registered_domain (oracle/test use)."""
    parts = host.split(".")
    if len(parts) <= 2:
        return host
    if ".".join(parts[-2:]).lower() in MULTI_SUFFIXES:
        return ".".join(parts[-3:])
    return ".".join(parts[-2:])


def domain_mix(urls: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain URL accounting — the domain-level version of
    corpus_mix (training mixtures are specified per eTLD+1, not per
    vhost): (domain, n_urls, n_hosts). One codegen scan + one map-side-
    combinable aggregate with an exact distinct (swap in
    approx_count_distinct at the 10^10 tier)."""
    u = F.col(url_col)
    host = F.regexp_extract(u, "^[a-z]+://([^/?#]+)", 1)
    per = urls.select(host.alias("host")).withColumn(
        "domain", registered_domain(F.col("host"))
    )
    return per.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("host").alias("n_hosts"),
    )


def url_trap_stats(
    urls: DataFrame, url_col: str = "url", exact: bool = True
) -> DataFrame:
    """Crawler-trap detection per host (Heritrix/Nutch-style URL-space
    explosion signal): collapse every digit run in the path to 'N' to get
    a path TEMPLATE, then per host report how many concrete URLs share how
    few templates. A calendar page, session-id space, or infinite
    pagination shows up as trap_score = n_urls / n_templates >> 1 with a
    dominant template — the hosts a frontier should rate-limit or cap.

    Host/path come from one anchored regex each (identical expression in
    the DuckDB oracle — no parse_url dependence), so the whole operator is
    one codegen scan + one map-side-combinable aggregate.

    ``exact`` picks the distinct strategy: True → countDistinct (two-pass
    expand-aggregate; DuckDB-oracle-comparable — what queries() uses),
    False → approx_count_distinct (single-pass HLL, rsd 5% — the
    10^10-URL default: the trap score needs one significant digit, not
    exactness, and HLL drops the second exchange over (host, template)).
    Both paths share the scan/template expressions and output schema.
    """
    u = F.col(url_col)
    host = F.regexp_extract(u, "^[a-z]+://([^/?#]+)", 1)
    path = F.regexp_extract(u, "^[a-z]+://[^/?#]+([^?#]*)", 1)
    template = F.regexp_replace(path, "[0-9]+", "N")
    per_url = urls.select(host.alias("host"), template.alias("template"))
    n_templates = (
        F.countDistinct("template")
        if exact
        else F.approx_count_distinct("template", rsd=0.05)
    )
    return (
        per_url.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            n_templates.alias("n_templates"),
        )
        .select(
            "host",
            "n_urls",
            "n_templates",
            F.round(F.col("n_urls") / F.col("n_templates"), 6).alias("trap_score"),
        )
    )


def url_quality_keep(url_col) -> "F.Column":
    """Boolean keep-predicate for the crawl path's opt-in pre-fetch URL
    filter (CrawlConfig.url_quality_filter): drop path-blocklisted URLs
    and media extensions — the same classes url_quality reports, as one
    codegen string/regex expression over the canonical URL (no shuffle;
    rides the candidate scan). url_quality_keep_py is the bit-equal
    pure-Python mirror the crawl oracle applies at the same stage."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col
    path_part = F.substring_index(u, "?", 1)
    ext = F.lower(F.regexp_extract(path_part, "[.]([A-Za-z0-9]{1,5})$", 1))
    return (F.regexp_count(path_part, F.lit(URL_BLOCKLIST)) == 0) & ~ext.isin(
        URL_MEDIA_EXTS
    )


_URL_BLOCKLIST_RE = re.compile(URL_BLOCKLIST)
_URL_EXT_RE = re.compile(r"\.([A-Za-z0-9]{1,5})$")


def url_quality_keep_py(url: str) -> bool:
    """Pure-Python mirror of url_quality_keep (oracle/simulator tier)."""
    path_part = url.split("?", 1)[0]
    if _URL_BLOCKLIST_RE.search(path_part):
        return False
    m = _URL_EXT_RE.search(path_part)
    return not (m and m.group(1).lower() in URL_MEDIA_EXTS)


def unigram_logprob(
    docs: DataFrame,
    min_count: int = 2,
    broadcast_vocab: bool | None = None,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Language-model perplexity proxy (CCNet-style quality signal,
    public literature — CCNet buckets docs by LM perplexity; the unigram
    log-probability is the train-free analog): per-doc mean log
    probability of its words under the corpus's own unigram distribution,
    plus the out-of-vocabulary count. Very low mean log-prob = gibberish
    / rare-token soup; very high = repetitive boilerplate — both are
    filter signals.

    Scale shape: ONE corpus-wide word-count aggregate (map-side combined,
    result is vocabulary-sized), joined back against the exploded words,
    then a per-doc mean — the same two-shuffle class as every per-doc
    aggregate here. "Small after min_count pruning" only holds while the
    zipf tail actually clears the corpus scale (min_count=2 over a
    web-scale corpus still leaves 10^8+ tokens), so the vocab join is
    broadcast-hinted only while the pruned vocabulary MEASURES under
    `broadcast_max_rows` (`broadcast_vocab=None`; True/False force) —
    above it the same join runs as a shuffle join, digest-identical.
    OOV words score at the add-half floor (0.5/total), so the metric is
    total-order stable across engines."""
    w = docs.select("doc_id", F.explode(words_col()).alias("w"))
    vocab = w.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    kept = vocab.filter(F.col("c") >= min_count)
    total = vocab.agg(F.sum("c").alias("total"))  # 1 row, broadcast below
    joined = (
        w.join(_gated_broadcast(kept, broadcast_vocab, broadcast_max_rows), "w", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.col("c").isNull().cast("int").alias("oov"),
            F.log(
                F.coalesce(F.col("c").cast("double"), F.lit(0.5))
                / F.col("total").cast("double")
            ).alias("logp"),
        )
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_words"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        F.round(F.avg("logp"), 6).alias("mean_logprob"),
    )


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (Xie et al. 2023, public
# literature) — hashed n-gram importance weights toward a target corpus
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256


def _gram_bucket_rows(docs: DataFrame, n_buckets: int) -> DataFrame:
    """(doc_id, b): one row per unigram+bigram occurrence, hashed into
    ``n_buckets`` via the md5-first-32-bits construction both engines
    share (shingle_hash_col); row multiplicity IS the count."""
    w = docs.select("doc_id", words_col().alias("ws"))
    grams = w.select(
        "doc_id",
        F.explode(
            F.concat(F.col("ws"), shingles_col(F.col("ws"), n=2))
        ).alias("g"),
    )
    return grams.select(
        "doc_id",
        F.pmod(
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("b"),
    )


def dsir_logweights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = DSIR_BUCKETS,
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR importance weights: select raw-corpus docs toward a TARGET
    distribution (the public Xie et al. 2023 recipe — hashed n-gram
    features, bag-of-buckets importance estimator):

        log w(x) = Σ_b c_x[b] · (log p_t[b] − log p_r[b])

    with add-``smoothing`` categorical estimates over ``n_buckets`` hash
    buckets fit on the target / raw corpora. Also emits ``sample_key`` =
    log w + Gumbel(md5(doc_id)) — the Gumbel-top-k trick turns
    resampling-∝-w into a deterministic ORDER BY sample_key DESC LIMIT k
    (no RNG state, identical at any parallelism; u derives from the md5
    of doc_id exactly like hash_sample's keep rule).

    Output: (doc_id, n_grams, logw, sample_key), rounded to 6 dp at the
    output only; docs with zero grams carry no row (nothing to weigh).

    Scale shape at 100 TB: the RAW corpus is touched by exactly one
    explode + one B-bucket map-side-combinable aggregate (B-row result)
    + one broadcast join (the B-row λ table) + one doc-keyed aggregate —
    nothing corpus-derived is ever broadcast and no global sort exists;
    selection downstream is TakeOrdered on sample_key. The target corpus
    (a quality reference — tiny next to the raw crawl) pays the same two
    aggregates."""
    spark = docs.sparkSession
    raw_rows = _gram_bucket_rows(docs, n_buckets)
    tgt_rows = _gram_bucket_rows(target, n_buckets)
    r_counts = raw_rows.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    t_counts = tgt_rows.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    r_total = raw_rows.agg(F.count(F.lit(1)).cast("double").alias("tr"))
    t_total = tgt_rows.agg(F.count(F.lit(1)).cast("double").alias("tt"))
    buckets = spark.range(n_buckets).select(F.col("id").alias("b"))
    s, sb = float(smoothing), float(smoothing) * n_buckets
    lam = (
        buckets.join(t_counts, "b", "left")
        .join(r_counts, "b", "left")
        .crossJoin(F.broadcast(t_total))
        .crossJoin(F.broadcast(r_total))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)).cast("double") + s)
                    / (F.col("tt") + sb)
                )
                - F.log(
                    (F.coalesce(F.col("cr"), F.lit(0)).cast("double") + s)
                    / (F.col("tr") + sb)
                )
            ).alias("lam"),
        )
    )
    per_doc = (
        raw_rows.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum("lam").alias("_logw"),
        )
    )
    # Gumbel noise from the doc_id hash: u = (h32 + 0.5) / 2^32 ∈ (0,1)
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#dsir"))), 1, 8),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    return per_doc.select(
        "doc_id",
        "n_grams",
        F.round("_logw", 6).alias("logw"),
        F.round(F.col("_logw") - F.log(-F.log(u)), 6).alias("sample_key"),
    )


def mg_candidates(tokens: DataFrame, k: int) -> DataFrame:
    """Pass 1 of exact heavy hitters: per-partition Misra–Gries summaries
    (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
    Summaries", PODS 2012). Each partition streams its Arrow batches
    through a k-counter summary: add the batch's value_counts, and
    whenever the summary exceeds k entries subtract the (k+1)-th largest
    count from ALL entries and drop the non-positive ones (one vectorized
    pandas step — a legal batched MG decrement). Memory is O(k) per
    partition regardless of vocabulary size — THE reason this exists
    instead of a full groupBy: at web scale the token vocabulary is
    corpus-sized, but the summary never is.

    Guarantee (the one pass 2 relies on): each decrement removes ≥ (k+1)·d
    mass, so a partition's total undercount is ≤ N_p/(k+1); a token
    dropped from EVERY partition summary therefore has global count
    ≤ Σ N_p/(k+1) = N/(k+1). With k ≥ 1/φ, every true φ-heavy hitter
    survives in at least one summary. The candidate SET depends on
    partitioning (it may include extras and varies with parallelism) —
    only ``heavy_hitters``' exact pass-2 output is deterministic."""
    import pandas as pd

    kk = int(k)

    def summarize(batches):
        s = pd.Series(dtype="int64")
        for pdf in batches:
            s = s.add(pdf["token"].value_counts(), fill_value=0)
            if len(s) > kk:
                d = s.nlargest(kk + 1).iloc[-1]
                s = s[s > d] - d
        yield pd.DataFrame({"token": s.index.astype(str)})

    return tokens.mapInPandas(summarize, "token string")


def heavy_hitters(
    docs: DataFrame,
    phi: float = 0.01,
    text_col: str = "text",
    k: int | None = None,
    broadcast_candidates: bool | None = None,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """EXACT φ-heavy hitters — every token with count > φ·N, N = total
    token occurrences — in two passes, never materializing a full
    vocabulary aggregate:

    1. ``mg_candidates`` (O(k)-memory Misra–Gries per partition,
       k = ceil(2/φ) so the survival bound N/(k+1) < φN/2 has 2× slack);
       the distinct union is ≤ k·P rows — sketch-sized, not vocab-sized.
    2. exact count of ONLY the candidate slice (semi-join; broadcast
       gated by measured size per the BROADCAST_MAX_ROWS discipline —
       k·P can be large when φ is tiny and P is web-scale) and the
       φ·N threshold, N from a 1-row broadcast aggregate.

    The output is exact, so it is parallelism-invariant even though the
    intermediate candidate set is not (tests assert both). Returns
    (token, cnt, frac) with frac rounded to 6 dp; threshold compares
    doubles identically in Spark and the DuckDB oracle."""
    import math

    tokens = docs.select(F.explode(words_col(text_col)).alias("token"))
    if k is None:
        k = max(1, math.ceil(2.0 / phi))
    cands = mg_candidates(tokens, k).distinct()
    n1 = tokens.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    counted = (
        tokens.join(
            _gated_broadcast(cands, broadcast_candidates, broadcast_max_rows),
            "token",
            "semi",
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counted.crossJoin(F.broadcast(n1))
        .filter(F.col("cnt").cast("double") > F.lit(float(phi)) * F.col("n_total"))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("n_total"), 6).alias("frac"),
        )
    )


def bigram_logprob(
    docs: DataFrame,
    min_count: int = 2,
    lam: float = 0.7,
    broadcast_model: bool | None = None,
    broadcast_max_rows: int = BROADCAST_MAX_ROWS,
) -> DataFrame:
    """Interpolated bigram language-model score per doc — the next rung
    of the CCNet perplexity-bucketing ladder above ``unigram_logprob``
    (CCNet filters on a KenLM 5-gram; a corpus-self-trained interpolated
    bigram is the train-free sandbox analog with the same join algebra a
    real n-gram table would need). Chain rule: the first word scores
    unigram-only (with the same 0.5/T OOV floor as unigram_logprob);
    every following word scores log(λ·P_bi(w|prev) + (1−λ)·P_uni(w)),
    where an unseen-or-pruned bigram contributes P_bi = 0 and the
    unigram back-off keeps the log defined. Returns per-doc
    (doc_id, n_words, n_bigrams, n_hit_bigrams, mean_logprob[6dp]);
    low = gibberish, high = repetitive boilerplate.

    Scale shape: TWO corpus-wide keyed aggregates (unigram counts →
    vocab-sized; bigram counts with min_count pruning → pair-vocabulary-
    sized), each joined back against the exploded corpus KEYED — both
    model tables are corpus-derived, so they are broadcast-hinted only
    while they MEASURE under `broadcast_max_rows` (the line_dedup /
    unigram_logprob discipline); context totals derive from the UNPRUNED
    bigram aggregate by first-token re-aggregation (vocab-sized). One
    per-doc aggregate at the end. Nothing corpus-derived is
    unconditionally broadcast; λ-arithmetic uses Python-computed double
    literals so the DuckDB twin is bit-identical."""
    w = docs.select("doc_id", F.posexplode(words_col()).alias("pos", "w"))
    uni = w.groupBy("w").agg(F.count(F.lit(1)).alias("cu"))
    total = uni.agg(F.sum("cu").alias("total"))  # 1 row, broadcast below
    bg_all = (
        docs.select(
            "doc_id", F.explode(shingles_col(words_col(), 2)).alias("bg")
        )
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    ctx = (
        bg_all.select(F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"), "cb")
        .groupBy("w1")
        .agg(F.sum("cb").alias("cctx"))
    )
    bg_kept = bg_all.filter(F.col("cb") >= min_count)

    first = (
        w.filter(F.col("pos") == 0)
        .join(_gated_broadcast(uni, broadcast_model, broadcast_max_rows), "w", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(
                F.coalesce(F.col("cu").cast("double"), F.lit(0.5))
                / F.col("total").cast("double")
            ).alias("logp"),
            F.lit(None).cast("int").alias("hit"),
        )
    )
    dbg = docs.select(
        "doc_id", F.explode(shingles_col(words_col(), 2)).alias("bg")
    ).select(
        "doc_id",
        "bg",
        F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    lam = float(lam)
    one_m = 1.0 - lam
    scored = (
        dbg.join(_gated_broadcast(bg_kept, broadcast_model, broadcast_max_rows), "bg", "left")
        .join(_gated_broadcast(ctx, broadcast_model, broadcast_max_rows), "w1", "left")
        .join(
            _gated_broadcast(
                uni.withColumnRenamed("w", "w2").withColumnRenamed("cu", "cu2"),
                broadcast_model,
                broadcast_max_rows,
            ),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.log(
                F.lit(lam)
                * F.coalesce(
                    F.col("cb").cast("double") / F.col("cctx").cast("double"),
                    F.lit(0.0),
                )
                + F.lit(one_m)
                * F.coalesce(F.col("cu2").cast("double"), F.lit(0.5))
                / F.col("total").cast("double")
            ).alias("logp"),
            F.col("cb").isNotNull().cast("int").alias("hit"),
        )
    )
    return (
        first.unionByName(scored)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            (F.count(F.lit(1)) - 1).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("bigint").alias("n_hit_bigrams"),
            F.round(F.avg("logp"), 6).alias("mean_logprob"),
        )
    )


def curation_keep_list(
    docs: DataFrame,
    bench: DataFrame,
    min_quality: float = 0.3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """The END of the curation pipeline: one row per training doc with the
    keep/drop DECISION and the first failing stage as the reason — the
    artifact a training run actually consumes (every upstream operator in
    this module produces evidence; this composes it into the verdict).

    Stage order mirrors the physical pipeline (cheapest, highest-volume
    cut first; each later stage only matters for survivors):
      1. exact_dup      — not the min-doc_id representative of its md5
                          text group (``exact_dedup``);
      2. near_dup       — an LSH-verified near-duplicate cluster member
                          that is not the cluster's min-doc_id rep
                          (``lsh_verified_pairs`` → pointer-jumping
                          connected components; pairs exist among exact
                          reps only, so stages 1/2 never contradict);
      3. contaminated   — shares a 3-gram shingle with the benchmark set
                          (``decontaminate``);
      4. low_quality    — heuristic ``quality_score`` below
                          ``min_quality``;
      else 'kept'.

    Returns (doc_id, keep boolean, reason, quality). Scale shape: a pure
    composition of the constituent operators' proven shapes plus
    doc_id-keyed LEFT joins of per-stage flag sets onto the quality table
    (each flag set ≪ corpus: dup tails, verified-cluster members,
    contaminated docs); no new shuffle class, nothing corpus-derived
    broadcast (decontaminate's bench side is the only broadcast and is
    benchmark-sized). The DuckDB oracle replays all four stages and the
    CASE verbatim."""
    from crawlspark import graphops

    with_hash = docs.select("doc_id", F.md5("text").alias("text_hash"))
    ex = with_hash.join(
        exact_dedup(docs).select("text_hash", "rep_doc_id"), "text_hash"
    ).select("doc_id", (F.col("doc_id") != F.col("rep_doc_id")).alias("_e"))
    pairs = lsh_verified_pairs(docs, threshold=jaccard_threshold).select(
        "doc_a", "doc_b"
    )
    cc = graphops.connected_components(pairs, src="doc_a", dst="doc_b")
    nd = cc.select(
        F.col("node").alias("doc_id"),
        (F.col("node") != F.col("component")).alias("_n"),
    )
    ct = decontaminate(docs, bench).select(
        "doc_id", F.lit(True).alias("_c")
    )
    q = quality_score(docs).select("doc_id", "quality")
    reason = (
        F.when(F.coalesce(F.col("_e"), F.lit(False)), F.lit("exact_dup"))
        .when(F.coalesce(F.col("_n"), F.lit(False)), F.lit("near_dup"))
        .when(F.coalesce(F.col("_c"), F.lit(False)), F.lit("contaminated"))
        .when(F.col("quality") < F.lit(float(min_quality)), F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    return (
        q.join(ex, "doc_id", "left")
        .join(nd, "doc_id", "left")
        .join(ct, "doc_id", "left")
        .select("doc_id", reason.alias("reason"), "quality")
        .select(
            "doc_id",
            (F.col("reason") == "kept").alias("keep"),
            "reason",
            "quality",
        )
    )


def ppl_buckets(
    docs: DataFrame,
    n_tiles: int = 3,
    n_buckets: int = 32,
    min_count: int = 2,
    lam: float = 0.7,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): per corpus
    source, docs split into ``n_tiles`` equal-count tiers by LM score —
    tile 1 = "head" (most-probable text, lowest perplexity), last =
    "tail"; CCNet keeps head+middle for training and holds the tail for
    audit. The LM is the corpus-self-trained interpolated bigram
    (``bigram_logprob``); higher mean_logprob = lower perplexity, so
    tiles order by mean_logprob DESC (doc_id asc ties).

    Returns (doc_id, source, mean_logprob, tile, bucket) with bucket one
    of head/middle/tail when n_tiles=3 (else "t<k>").

    Scale shape: the per-source NTILE is NEVER a per-source global window
    (a single source can be most of a 10^10-doc corpus). It decomposes
    exactly like linkgraph.pagerank_boosts_df, partitioned by source:
    (1) one source-cardinality aggregate carrying per-source N and
    ``n_buckets-1`` percentile_approx boundaries (broadcast); (2) rows
    bucket by "how many boundaries ≥ my score" — monotone in descending
    score and tie-consistent, so each (source, score) tie-group lands
    wholly in one bucket; (3) row_number per (source,bucket) — the only
    sort, ≈N_source/n_buckets rows per partition; (4) bucket sizes →
    per-source running offsets (a metadata window over ≤ sources×buckets
    rows) broadcast back = exact per-source rank; (5) the same
    pure-integer closed-form ntile as pagerank_boosts_df (div/mod only —
    no float rank division). Equality with SQL NTILE is asserted by the
    DuckDB oracle (ppl_buckets) and pagerank_boosts_rel proves the
    closed form against NTILE independently."""
    from pyspark.sql import Window

    lp = bigram_logprob(docs, min_count=min_count, lam=lam).select(
        "doc_id", "mean_logprob"
    )
    d = lp.join(docs.select("doc_id", "source"), "doc_id")
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("_n"),
        F.percentile_approx(
            "mean_logprob",
            [i / n_buckets for i in range(1, n_buckets)],
            1_000_000,
        ).alias("_bounds"),
    )
    b = d.join(F.broadcast(agg), "source").withColumn(
        "_bucket", F.expr("size(filter(_bounds, x -> x >= mean_logprob))")
    )
    wb = Window.partitionBy("source", "_bucket").orderBy(
        F.col("mean_logprob").desc(), F.col("doc_id").asc()
    )
    local = b.withColumn("_lr", F.row_number().over(wb))
    sizes = local.groupBy("source", "_bucket").agg(
        F.count(F.lit(1)).alias("_sz")
    )
    wo = (
        Window.partitionBy("source")
        .orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "source",
        "_bucket",
        F.coalesce(F.sum("_sz").over(wo), F.lit(0)).alias("_off"),
    )
    g = local.join(F.broadcast(offs), ["source", "_bucket"]).withColumn(
        "_rank", (F.col("_off") + F.col("_lr")).cast("long")
    )
    k = int(n_tiles)
    tile = F.expr(
        f"CASE WHEN _rank <= (_n % {k}) * (_n div {k} + 1)"
        f" THEN (_rank + _n div {k}) div (_n div {k} + 1)"
        f" ELSE _n % {k} + (_rank - (_n % {k}) * (_n div {k} + 1)"
        f" + _n div {k} - 1) div (_n div {k}) END"
    )
    names = (
        ["head", "middle", "tail"] if k == 3 else [f"t{i + 1}" for i in range(k)]
    )
    label = F.element_at(
        F.array(*[F.lit(x) for x in names]), F.col("tile").cast("int")
    )
    return (
        g.select(
            "doc_id",
            "source",
            "mean_logprob",
            tile.cast("int").alias("tile"),
        )
        .withColumn("bucket", label)
    )


def group_sample(
    docs: DataFrame, n_per_group: int, group_col: str = "source"
) -> DataFrame:
    """Deterministic fixed-COUNT per-group sample — exactly
    min(n, group_size) docs per group, the eval-set/inspection-set
    builder that complements ``hash_sample``'s fixed-RATE sampling.
    Selection order is md5(doc_id ∥ '#gs') — a seedless uniform draw
    both engines replay exactly, independent of partitioning and of any
    upstream sort; doc_id uniqueness makes the order total.

    Scale shape: ONE window partitioned by the group column; the
    row_number ≤ n filter compiles to WindowGroupLimit, so every input
    partition pre-trims to n rows per group BEFORE the exchange —
    shuffle volume is bounded by n·groups·partitions, not corpus size.
    Skewed group sizes don't matter: the post-limit partition holds at
    most n·P rows per group."""
    from pyspark.sql import Window

    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#gs")))
    w = Window.partitionBy(group_col).orderBy(key.asc())
    return (
        docs.select("doc_id", group_col)
        .withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= F.lit(int(n_per_group)))
    )


def fuzzy_decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    band_cap: int = LSH_BAND_CAP,
) -> DataFrame:
    """Fuzzy benchmark decontamination (the GPT-3/PaLM appendix method,
    public literature): training docs that NEAR-duplicate an eval/bench
    doc — where ``decontaminate`` catches verbatim shingle overlap, this
    catches paraphrase-light copies via bipartite MinHash-LSH. ``bench``
    carries (bench_id, text). Candidates = (train doc, bench doc) pairs
    sharing ≥1 signature band; verification = exact n-gram Jaccard on
    CANDIDATES ONLY (never train×bench all-pairs); returns
    (doc_id, bench_id, jaccard) at or above ``threshold``.

    Scale shape: both sides pay the rowwise zero-shuffle minhash; the
    band join is KEYED on (band_idx, band_hash) — bench is eval-sized
    but nothing forces it into a broadcast; train band groups above
    ``band_cap`` are excluded from pairing exactly like
    lsh_candidate_pairs (audit with lsh_band_stats — same banding, same
    cap — so exclusions are counted, never silent); verify cost is
    O(candidate pairs). Train docs are NOT dedup-collapsed first: every
    contaminated copy must be flagged for removal."""
    tb = _banded(docs, k, bands)
    sizes = tb.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    ok = tb.join(
        sizes.filter(F.col("n_docs") <= band_cap).select("band_idx", "band_hash"),
        ["band_idx", "band_hash"],
        "left_semi",
    )
    bb = _banded(
        bench.select(F.col("bench_id").alias("doc_id"), "text"), k, bands
    ).select("band_idx", "band_hash", F.col("doc_id").alias("bench_id"))
    cand = (
        ok.join(bb, ["band_idx", "band_hash"])
        .select("doc_id", "bench_id")
        .distinct()
    )
    g_t = docs.select(
        "doc_id", F.array_distinct(shingles_col(words_col())).alias("grams_t")
    )
    g_b = bench.select(
        "bench_id", F.array_distinct(shingles_col(words_col())).alias("grams_b")
    )
    joined = cand.join(g_t, "doc_id").join(g_b, "bench_id")
    inter = F.size(F.array_intersect(F.col("grams_t"), F.col("grams_b")))
    union = F.size("grams_t") + F.size("grams_b") - inter
    return joined.select(
        "doc_id",
        "bench_id",
        F.round(
            F.when(union > 0, inter.cast("double") / union.cast("double"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


def winnow_fingerprints(
    docs: DataFrame, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): over the doc's 3-gram hash
    sequence, every window of ``w`` consecutive hashes selects its
    RIGHTMOST minimal hash; the distinct (pos, h) selections are the
    fingerprint set. Guarantee: two docs sharing a token run of length
    ≥ w+2 share at least one fingerprint — the local, position-robust
    substring-matching primitive (doc_fingerprint's single rolling hash
    is global; this is the matchable form). Docs with fewer than w
    3-grams (< w+2 words) emit no rows. Returns exploded
    (doc_id, pos, h) — join-ready for cross-doc substring detection;
    expected density is 2/(w+1) fingerprints per gram.

    Scale shape: entirely rowwise, zero shuffles; the explode multiplies
    rows by ~2m/w per doc. Implementation notes (all measured): the
    window slices are STAGED as their own array column (the
    _staged_shingle_hashes / project-collapse discipline); the
    per-window rightmost-argmin is pure native array functions
    (array_min + reverse + array_position) — a first draft using a
    nested aggregate() with struct state ran ~50× slower (interpreted
    HOF state per step); and the final expansion is explode_OUTER + a
    post-generate null filter, NOT plain explode — InferFiltersFromGenerate
    adds `size(fps) > 0` below a non-outer Generate and predicate
    pushdown then SUBSTITUTES the whole staged HOF chain into that
    predicate, re-inlining wh→sh→wins multiplicatively (measured 275 s
    vs 3.5 s at sf0.01 — a 78× cliff; outer generates get no inferred
    filter). The rightmost-min rule is a deterministic total choice
    (position breaks value ties), so output is partitioning-independent."""
    sh = _staged_shingle_hashes(docs, text_col)
    wins = sh.select(
        "doc_id",
        F.when(
            F.size("sh") >= w,
            F.transform(
                F.sequence(F.lit(1), F.size("sh") - (w - 1)),
                lambda i: F.slice("sh", i, w),
            ),
        )
        .otherwise(F.array().cast("array<array<bigint>>"))
        .alias("wins"),
    )
    sel = F.transform(
        F.col("wins"),
        lambda s, i0: F.struct(
            F.array_min(s).alias("h"),
            (
                i0
                + F.lit(1 + w)
                - F.array_position(F.reverse(s), F.array_min(s))
            )
            .cast("int")
            .alias("pos"),
        ),
    )
    fps = wins.select("doc_id", F.array_distinct(sel).alias("fps"))
    return (
        fps.select("doc_id", F.explode_outer("fps").alias("f"))
        .filter(F.col("f").isNotNull())
        .select("doc_id", F.col("f.pos").alias("pos"), F.col("f.h").alias("h"))
    )


def export_manifest(docs: DataFrame, budget: int = 4096) -> DataFrame:
    """Shard manifest for a training-data export — the integrity record
    an exporter writes next to its shard files: per shard, the doc
    count, the token total, and a content digest (md5 over the shard's
    doc_ids in ascending order). Two exports of the same corpus+budget
    verify equal by comparing manifests alone — no re-read of payloads;
    a missing/duplicated doc flips its shard's digest.

    Builds on ``token_shards`` (distributed two-pass prefix sum — no
    global window); the manifest layer is ONE keyed aggregate on
    shard_id (map-side combinable; shard populations are
    ~budget/avg_doc_tokens docs, so collect_list stays shard-bounded).
    The digest sorts the collected ids NUMERICALLY before stringifying —
    string-sorting '10' < '9' would diverge from the oracle's
    ORDER BY doc_id."""
    sh = token_shards(docs, budget)
    return sh.groupBy("shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda d: d.cast("string"),
                ),
            )
        ).alias("docs_md5"),
    )


def source_length_stats(docs: DataFrame) -> DataFrame:
    """Per-source token-length distribution — the corpus-QA panel a
    mixture builder reads before weighting sources: doc count, mean
    tokens (6 dp), and EXACT nearest-rank p50/p90 (value at rank
    ⌈q·n⌉ in (n_tokens, doc_id) order — an explicit ROW_NUMBER
    construction, not an engine quantile, so Spark and the oracle agree
    by definition instead of by luck of interpolation semantics).

    Scale shape: one window partitioned by source (per-group sort — the
    group count is the SOURCE cardinality, small by construction; for
    per-host length stats at web scale use the bucketed two-phase
    prefix-sum discipline instead) + one keyed aggregate with
    conditional picks."""
    from pyspark.sql import Window

    t = docs.select(
        "doc_id", "source", F.size(words_col()).cast("bigint").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy(
        F.col("n_tokens").asc(), F.col("doc_id").asc()
    )
    cnt = Window.partitionBy("source")
    r = t.select(
        "source",
        "n_tokens",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(
            F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("n_tokens")
        )
    )
    return r.groupBy("source").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.round(F.avg("n_tokens"), 6).alias("mean_tokens"),
        pick(0.5).cast("bigint").alias("p50_tokens"),
        pick(0.9).cast("bigint").alias("p90_tokens"),
    )
