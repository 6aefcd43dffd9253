"""Multimodal plumbing (crawlspark/media.py): schema/batching are real,
decode is the documented stub — features, resize, frame-sampling, dedup
must be deterministic and structurally correct."""

from crawlspark import media


def test_features_deterministic(spark):
    df = media.synth_media_df(spark, 120)
    feats = media.extract_features(df)
    rows = {r["media_ref"]: r for r in feats.collect()}
    assert len(rows) == 120
    again = {r["media_ref"]: r for r in media.extract_features(df).collect()}
    for ref in rows:
        assert tuple(rows[ref]) == tuple(again[ref])
    r = next(iter(rows.values()))
    assert r["n_bytes"] > 16 and r["width"] >= 16 and "." in r["byte_mean"]


def test_resize_rewrites_dims(spark):
    df = media.synth_media_df(spark, 40)
    resized = media.resize_stub(df, 64, 48)
    feats = {r["media_ref"]: r for r in media.extract_features(resized).collect()}
    assert all(r["width"] == 64 and r["height"] == 48 for r in feats.values())


def test_frame_sampling_only_videos(spark):
    df = media.synth_media_df(spark, 150)
    frames = media.frame_sample_stub(df, every_n=5).collect()
    assert len(frames) > 0
    by_ref = {}
    for r in frames:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
    kinds = {r["media_ref"]: r["media_type"] for r in df.collect()}
    for ref, idxs in by_ref.items():
        assert kinds[ref] == "video"
        assert idxs == sorted(idxs) or sorted(idxs) == sorted(set(idxs))
        assert all(i % 5 == 0 for i in idxs)


def test_media_dedup(spark):
    base = media.synth_media_rows(30)
    dup = base + base[:7]  # 7 exact duplicate payloads under new refs
    dup = base + [(f"{r}-copy", t, p, m) for (r, t, p, m) in base[:7]]
    df = spark.createDataFrame(dup, media.MEDIA)
    groups = media.media_exact_dedup(df).collect()
    n2 = [g for g in groups if g["n_copies"] == 2]
    assert len(n2) == 7
    assert len(groups) == 30


def test_cdc_chunks_edit_locality_and_invariants(spark):
    """Content-defined chunking (media.cdc_chunk_table): chunks cover the
    payload contiguously; an appended trailer leaves every prior chunk
    boundary intact (the CDC property — at most the final chunk changes,
    plus new trailer chunks) while whole-blob hashing sees two unrelated
    blobs; Spark rows equal the pure core; parallelism invariant."""
    import hashlib

    from crawlspark import media

    base = media.synth_payload("http://h1.example/media/base")[1]
    edited = base + b"TRAILER!"
    rows = [
        ("ref/a", "image", base, {}),
        ("ref/b", "image", edited, {}),
    ]
    df = spark.createDataFrame(rows, media.MEDIA)
    got = sorted(
        map(tuple, media.cdc_chunk_table(df).collect()),
        key=lambda t: (t[0], t[1]),
    )
    exp = sorted(
        media.cdc_chunks_of("ref/a", base) + media.cdc_chunks_of("ref/b", edited),
        key=lambda t: (t[0], t[1]),
    )
    assert got == exp

    a = [r for r in exp if r[0] == "ref/a"]
    b = [r for r in exp if r[0] == "ref/b"]
    # contiguous cover
    for chunks, payload in ((a, base), (b, edited)):
        assert chunks[0][2] == 0
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur[2] == prev[2] + prev[3]
        assert chunks[-1][2] + chunks[-1][3] == len(payload)
        for _, _, off, ln, h in chunks:
            assert h == hashlib.md5(payload[off : off + ln]).hexdigest()
    # edit locality: all of a's chunks except possibly the last reappear in b
    ha = [r[4] for r in a]
    hb = {r[4] for r in b}
    assert all(h in hb for h in ha[:-1])
    # whole-blob dedup CANNOT pair them
    assert hashlib.md5(base).hexdigest() != hashlib.md5(edited).hexdigest()

    got7 = sorted(
        map(tuple, media.cdc_chunk_table(df.repartition(7)).collect()),
        key=lambda t: (t[0], t[1]),
    )
    assert got7 == exp


def test_cdc_numpy_core_bit_identical_to_scalar():
    """VERDICT r6 directive #2: the vectorized gear scan
    (media.cdc_chunks_of_np) must reproduce the scalar reference core
    row-for-row — offsets, lengths, indices, and md5s — across payload
    shapes (empty, shorter than min_len, exactly min/max_len, random,
    adversarial all-zero / all-same-byte runs) and parameter sweeps,
    including the min_len < avg_bits regime (where it must fall back and
    still be identical by construction)."""
    import random

    from crawlspark import media

    rng = random.Random(7)
    payloads = [
        b"",
        b"a",
        bytes(range(16)),          # == default min_len
        bytes(128),                # all zeros, == default max_len
        b"\xab" * 300,             # constant run
        bytes(rng.randrange(256) for _ in range(1)),
        bytes(rng.randrange(256) for _ in range(15)),
        bytes(rng.randrange(256) for _ in range(257)),
        bytes(rng.randrange(256) for _ in range(4096)),
        bytes(rng.randrange(256) for _ in range(65537)),
    ]
    params = [
        (16, 6, 128),   # defaults
        (16, 4, 64),
        (32, 8, 4096),
        (8, 6, 32),     # min_len just above avg_bits
        (6, 6, 48),     # min_len == avg_bits (boundary of the identity)
        (4, 6, 32),     # min_len < avg_bits: fallback path
        # production chunk-size regimes (VERDICT r7 #2: the doubling
        # kernel must stay bit-identical at large avg_bits, not just
        # the test default) — uint16 and uint32 accumulator dtypes
        (256, 13, 8192),
        (2048, 13, 65536),
        (4096, 20, 65536),
    ]
    for min_len, avg_bits, max_len in params:
        for i, p in enumerate(payloads):
            ref = f"ref/{i}"
            a = media.cdc_chunks_of(ref, p, min_len, avg_bits, max_len)
            b = media.cdc_chunks_of_np(ref, p, min_len, avg_bits, max_len)
            assert a == b, (min_len, avg_bits, max_len, i, a[:3], b[:3])


def test_cdc_xxh64_chunk_hash_same_boundaries():
    """chunk_hash='xxh64' (the production digest swap) changes ONLY the
    digest column: boundaries/indices identical to the md5 form, and
    each digest is the 16-hex xxh64 of the exact chunk bytes (the
    scalar-fallback regime included)."""
    import random

    from crawlspark import media
    from crawlspark.xxh64 import hash_bytes_np

    rng = random.Random(11)
    p = bytes(rng.randrange(256) for _ in range(20000))
    for min_len, avg_bits, max_len in [(16, 6, 128), (256, 13, 8192), (4, 6, 32)]:
        a = media.cdc_chunks_of_np(a_ref := "r/x", p, min_len, avg_bits, max_len)
        b = media.cdc_chunks_of_np(a_ref, p, min_len, avg_bits, max_len,
                                   chunk_hash="xxh64")
        assert [r[:4] for r in a] == [r[:4] for r in b]
        exp = hash_bytes_np([p[s : s + ln] for (_, _, s, ln, _) in a])
        import numpy as np

        assert [r[4] for r in b] == [
            f"{int(h):016x}" for h in exp.view(np.uint64)
        ]
    # empty payload: one empty chunk, xxh64 of b""
    e = media.cdc_chunks_of_np("r/e", b"", chunk_hash="xxh64")
    assert e[0][:4] == ("r/e", 0, 0, 0)
    import numpy as np

    assert e[0][4] == f"{int(hash_bytes_np([b'']).view(np.uint64)[0]):016x}"


def test_cdc_chunk_table_engines_identical(spark):
    """The Spark stage under both engines (numpy default / python
    reference) yields identical chunk tables over the mirror universe."""
    from crawlspark import media

    df = media.synth_media_mirror_df(spark, 60, 5)
    a = sorted(
        map(tuple, media.cdc_chunk_table(df, engine="numpy").collect()),
        key=lambda t: (t[0], t[1]),
    )
    b = sorted(
        map(tuple, media.cdc_chunk_table(df, engine="python").collect()),
        key=lambda t: (t[0], t[1]),
    )
    assert a == b and len(a) > 60
