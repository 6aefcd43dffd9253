"""Deterministic fixture generators (FIXTURES.md; seed 42 conventions).

Everything here is a pure function of xxh64 — bit-reproducible, no RNG, no
clock. Fixture parquet for the driver-contract queries is written once per
sf tier under ``fixtures/<sf>/`` by ``materialize_fixtures`` (invoked by
__spark_entry__.py on first use and by tests).
"""

from __future__ import annotations

import os

from .fetch_spec import FetchSpec
from .xxh64 import hash_str


def seed_urls(n_hosts: int = 50, n_deep: int = 140) -> list[str]:
    """FIXTURES.md §2: host roots + deep paths + canonicalization stress rows."""
    urls = [f"http://h{k}.example/" for k in range(n_hosts)]
    for i in range(n_deep):
        k = hash_str(f"seed#{i}") % n_hosts
        m = hash_str(f"seedm#{i}") % 500
        urls.append(f"http://h{k}.example/seed/{m}")
    urls += [
        "HTTP://H0.EXAMPLE:80/",                      # scheme/host case + default port
        "http://h1.example/a/../b/./c",                # dot segments
        "http://h2.example/x#fragment",                # fragment strip
        "http://h3.example/x?utm_source=z&q=1",        # tracking param drop
        "http://h4.example/%7euser/%41bc",             # pct-normalization
        "http://h5.example",                           # empty path -> /
        "https://h6.example:443/tls",                  # https default port
        "http://h0.example/",                          # duplicate of a root
        "ftp://h9.example/skip",                       # invalid scheme -> dropped
        "http://h7.example/" + "y" * 3000,             # over-long -> dropped
    ]
    return urls


def spec_for_sf(sf_name: str) -> FetchSpec:
    """Fetch-universe size per scale tier (bench grows hosts, not semantics)."""
    if sf_name.endswith("0.1"):
        return FetchSpec(n_hosts=2000, path_space=50000)
    if sf_name.endswith("0.01"):
        return FetchSpec(n_hosts=200, path_space=5000)
    return FetchSpec(n_hosts=50, path_space=2000)


def seeds_for_sf(sf_name: str) -> list[str]:
    spec = spec_for_sf(sf_name)
    if spec.n_hosts <= 50:
        return seed_urls(n_hosts=spec.n_hosts)
    return [f"http://h{k}.example/" for k in range(spec.n_hosts)] + [
        f"http://h{hash_str(f'bseed#{i}') % spec.n_hosts}.example/seed/{hash_str(f'bseedm#{i}') % 500}"
        for i in range(spec.n_hosts)
    ]


def _doc_url(i: int, spec: FetchSpec) -> tuple[str, str]:
    """(doc_id, url) of fixture doc i — the ONE definition both the span
    fixture and the doc_urls fixture derive from, so they stay in lockstep."""
    doc_id = f"doc{i:08d}"
    return doc_id, f"http://h{hash_str(doc_id) % spec.n_hosts}.example/fx/{i}"


def documents_spans_rows(n_docs: int, spec: FetchSpec) -> list[tuple[str, list[dict]]]:
    """FIXTURES.md §1 interleaved spans fixture — exactly the BASELINE
    input_hint shape (doc_id, spans). Span content is generated through the
    fetch spec keyed by a synthetic per-doc URL, so the hot-host skew and
    kind mix match the crawl's document stream."""
    from .fetch_spec import simulate_fetch

    rows = []
    for i in range(n_docs):
        doc_id, url = _doc_url(i, spec)
        status, spans = simulate_fetch(url, spec)
        if spans is None:
            spans = [{"kind": "text", "text": f"t404_{i}", "media_ref": None, "offset": 0}]
        rows.append((doc_id, spans))
    return rows


def doc_url_rows(n_docs: int, spec: FetchSpec) -> list[tuple[str, str]]:
    """(doc_id, url) for every span-fixture doc — the document's own URL,
    which the span fixture omits (its shape is pinned by the BASELINE
    input_hint). Stored as a side table so the link-graph oracles can
    resolve relative refs against the source host without reimplementing
    xxhash64 in DuckDB (same stored-hash discipline as the crawl-state
    fixtures, SURVEY.md §6.3)."""
    return [_doc_url(i, spec) for i in range(n_docs)]


def sitemap_rows(n_docs: int, spec: FetchSpec) -> list[tuple[str, str]]:
    """(host, xml) — one sitemap document per fixture host listing that
    host's fixture docs (same ``_doc_url`` universe as doc_urls, so the
    sitemap intake path and the link-extraction path discover overlapping
    URL sets, like a real crawl). Field mix is index-derived and exercises
    every parse path: lastmod omitted when i%11==0, changefreq omitted
    when i%13==0 else cycling all 7 protocol values, priority omitted when
    i%7==0 (→ protocol default 0.5); every 5th host gets one malformed
    ``<url>`` entry with no ``<loc>`` (must be dropped); whitespace and
    newlines vary so the non-greedy ``(?s)`` parse is actually load-bearing."""
    import datetime

    base = datetime.date(2025, 10, 1)
    freqs = ["daily", "weekly", "monthly", "hourly", "yearly", "always", "never"]
    per_host: dict[str, list[str]] = {}
    for i in range(n_docs):
        _, url = _doc_url(i, spec)
        host = url.split("/")[2]
        parts = [f"\n  <url>\n    <loc> {url} </loc>"]
        if i % 11 != 0:
            d = base + datetime.timedelta(days=(i * 7) % 240)
            parts.append(f"\n    <lastmod>{d.isoformat()}</lastmod>")
        if i % 13 != 0:
            parts.append(f"\n    <changefreq>{freqs[i % 7]}</changefreq>")
        if i % 7 != 0:
            parts.append(f"\n    <priority>{(i % 10) / 10:.1f}</priority>")
        parts.append("\n  </url>")
        per_host.setdefault(host, []).append("".join(parts))
    rows = []
    for k, host in enumerate(sorted(per_host)):
        entries = per_host[host]
        if k % 5 == 0:
            entries = entries + ["\n  <url>\n    <lastmod>2026-01-01</lastmod>\n  </url>"]
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + "".join(entries)
            + "\n</urlset>\n"
        )
        rows.append((host, xml))
    return rows


FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def fixture_dir(sf_name: str) -> str:
    return os.path.join(FIXTURE_ROOT, sf_name)


FIXTURE_ROUND = 3  # the captured "final round" all crawl-state fixtures pin


def materialize_fixtures(spark, sf_name: str, n_docs: int | None = None) -> str:
    """Write fixture parquet for a tier (idempotent): documents_spans, seeds,
    robots, and oracle-captured crawl-state tables of round FIXTURE_ROUND
    (frontier-before / eligible inputs, selected, candidates_raw,
    candidates, seen-before) with STORED url/host hashes, so DuckDB oracle
    SQL can match Spark bit-for-bit without reimplementing xxhash64
    (SURVEY.md §6.3)."""
    from oracle.simulator import simulate
    from .config import CrawlConfig
    from .robots import robots_rows
    from .schemas import DOCUMENTS_SPANS_FIXTURE, FRONTIER, ROBOTS, SEEDS, SEEN

    out = fixture_dir(sf_name)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        _materialize_doc_urls(spark, sf_name, out, n_docs)
        _materialize_sitemaps(sf_name, out, n_docs)
        return out
    os.makedirs(out, exist_ok=True)
    spec = spec_for_sf(sf_name)
    if n_docs is None:
        n_docs = _default_n_docs(sf_name)

    def write(df, name, parts=4):
        df.repartition(parts).write.mode("overwrite").parquet(os.path.join(out, name))

    docs = documents_spans_rows(n_docs, spec)
    write(spark.createDataFrame(docs, DOCUMENTS_SPANS_FIXTURE), "documents_spans.parquet", 8)

    seeds = seeds_for_sf(sf_name)
    write(spark.createDataFrame([(u,) for u in seeds], SEEDS), "seeds.parquet", 1)

    hosts = [f"h{k}.example" for k in range(spec.n_hosts)]
    write(spark.createDataFrame(robots_rows(hosts), ROBOTS), "robots.parquet", 1)

    cfg = CrawlConfig()
    res = simulate(seeds, cfg, spec, max_rounds=FIXTURE_ROUND)

    def entry_row(e):
        from .robots import rules_for_host

        delay = rules_for_host(e.host)[2]
        budget = max(1, cfg.max_fetches_per_host_per_round // delay)
        return (
            e.url, e.url_hash, e.host, e.host_hash, e.priority, e.crawl_depth,
            e.discovered_round, e.not_before_round, "pending", budget, delay,
        )

    # frontier BEFORE round FIXTURE_ROUND (i.e. snapshot of round-1 end)
    write(
        spark.createDataFrame(
            [entry_row(e) for e in res.frontier_by_round[FIXTURE_ROUND - 1]], FRONTIER
        ),
        "frontier.parquet",
    )
    # seen BEFORE round FIXTURE_ROUND
    write(
        spark.createDataFrame(
            [(uh, u, uh % cfg.n_buckets) for uh, u in sorted(res.last_seen_before.items())],
            SEEN,
        ),
        "seen.parquet",
    )
    # selected batch of round FIXTURE_ROUND, with per-host rank
    sel_schema = (
        "url string, url_hash long, host string, host_hash long, priority int, "
        "crawl_depth int, rank int"
    )
    write(
        spark.createDataFrame(
            [
                (e.url, e.url_hash, e.host, e.host_hash, e.priority, e.crawl_depth, rk)
                for e, rk in res.last_selected
            ],
            sel_schema,
        ),
        "selected.parquet",
    )
    cand_schema = (
        "url string, url_hash long, host string, host_hash long, priority int, "
        "crawl_depth int, bucket int"
    )
    for name, rows in (
        ("candidates_raw.parquet", res.last_candidates_raw),
        ("candidates.parquet", res.last_candidates),
    ):
        write(
            spark.createDataFrame(
                [
                    (e.url, e.url_hash, e.host, e.host_hash, e.priority, e.crawl_depth,
                     e.url_hash % cfg.n_buckets)
                    for e in rows
                ],
                cand_schema,
            ),
            name,
        )
    with open(done, "w") as f:
        f.write("ok\n")
    _materialize_doc_urls(spark, sf_name, out, n_docs)
    _materialize_sitemaps(sf_name, out, n_docs)
    return out


def _default_n_docs(sf_name: str) -> int:
    return {"sf0.001": 1000, "sf0.01": 10000, "sf0.1": 50000}.get(sf_name, 1000)


def _materialize_doc_urls(spark, sf_name: str, out: str, n_docs: int | None) -> None:
    """Additive upgrade of an existing fixture dir (same pattern as
    ``_DONE_EXPECTED``): writes ``doc_urls.parquet`` once, marker-gated, so
    committed fixture parquet is never rewritten. Written with pyarrow
    directly (driver-side, tiny) so the oracle side can materialize it
    without a SparkSession; laid out as a directory of one part file so
    both ``spark.read.parquet(dir)`` and DuckDB's ``dir/*.parquet`` glob
    read it like every other fixture table. ``spark`` is unused and
    accepted only for call-site symmetry."""
    del spark
    marker = os.path.join(out, "_DONE_DOCURLS")
    if os.path.exists(marker):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    spec = spec_for_sf(sf_name)
    rows = doc_url_rows(n_docs or _default_n_docs(sf_name), spec)
    tdir = os.path.join(out, "doc_urls.parquet")
    os.makedirs(tdir, exist_ok=True)
    table = pa.table(
        {"doc_id": [r[0] for r in rows], "url": [r[1] for r in rows]},
        schema=pa.schema([("doc_id", pa.string()), ("url", pa.string())]),
    )
    pq.write_table(table, os.path.join(tdir, "part-0.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")


def _materialize_sitemaps(sf_name: str, out: str, n_docs: int | None) -> None:
    """Additive marker-gated upgrade (same pattern as ``_materialize_doc_urls``):
    writes ``sitemaps.parquet`` once per fixture dir, pyarrow-direct (tiny,
    driver-side, no SparkSession needed) so both Spark and the DuckDB
    oracle read the identical bytes."""
    marker = os.path.join(out, "_DONE_SITEMAPS")
    if os.path.exists(marker):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    spec = spec_for_sf(sf_name)
    rows = sitemap_rows(n_docs or _default_n_docs(sf_name), spec)
    tdir = os.path.join(out, "sitemaps.parquet")
    os.makedirs(tdir, exist_ok=True)
    table = pa.table(
        {"host": [r[0] for r in rows], "xml": [r[1] for r in rows]},
        schema=pa.schema([("host", pa.string()), ("xml", pa.string())]),
    )
    pq.write_table(table, os.path.join(tdir, "part-0.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")


def materialize_doc_url_fixtures(sf_name: str) -> str:
    """Spark-free entry point (oracle side): ensure the additive side
    tables (doc_urls, sitemaps) exist for an already-materialized dir."""
    out = fixture_dir(sf_name)
    if os.path.isdir(out):
        _materialize_doc_urls(None, sf_name, out, None)
        _materialize_sitemaps(sf_name, out, None)
    return out


def materialize_expected_fixtures(sf_name: str) -> str:
    """Expected-output oracle fixtures for the driver queries whose engine
    path crosses a pandas/Arrow UDF (canon_urls, fetch_documents,
    bloom_roundtrip, media_features, media_frame_sample).

    The SAME pure-Python cores the engine wraps (urlnorm.canon_url,
    fetch_spec.simulate_fetch, media.features_of/frame_rows_of, bloom
    build/probe) are executed driver-side — no Spark — and their results
    written as plain parquet files that ``oracle_sql()`` reads back with
    DuckDB ``read_parquet``. The comparison therefore verifies everything
    Spark adds on top of the cores: Arrow serialization round-trips,
    partitioning/batching, schema and null handling, filter placement.
    Idempotent via a ``_DONE_EXPECTED`` marker (the base fixtures use
    ``_DONE``; this function only ever ADDS files, so committed fixture
    parquet is never rewritten)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from . import bloom, media, urlnorm
    from .fetch_spec import doc_id_of, simulate_fetch

    out = fixture_dir(sf_name)
    done = os.path.join(out, "_DONE_EXPECTED")
    if os.path.exists(done):
        return out
    if not os.path.exists(os.path.join(out, "_DONE")):
        raise FileNotFoundError(f"base fixtures missing under {out}")

    def read_cols(name: str, cols: list[str]) -> dict[str, list]:
        tbl = pq.read_table(os.path.join(out, name), columns=cols)
        return {c: tbl.column(c).to_pylist() for c in cols}

    # -- canon_urls: seeds -> (url, canon_url), invalid rows dropped --------
    rows = [(u, urlnorm.canon_url(u)) for u in seeds_for_sf(sf_name)]
    rows = [(u, c) for u, c in rows if c is not None]
    pq.write_table(
        pa.table(
            {"url": [r[0] for r in rows], "canon_url": [r[1] for r in rows]},
            schema=pa.schema([("url", pa.string()), ("canon_url", pa.string())]),
        ),
        os.path.join(out, "expected_canon.parquet"),
    )

    # -- fetch_documents: selected batch -> (doc_id, url, status, n_spans) --
    spec = spec_for_sf(sf_name)
    sel = read_cols("selected.parquet", ["url", "url_hash"])
    doc_rows = []
    for url, uh in zip(sel["url"], sel["url_hash"]):
        status, spans = simulate_fetch(url, spec)
        doc_rows.append(
            (doc_id_of(uh), url, status, len(spans) if spans is not None else -1)
        )
    pq.write_table(
        pa.table(
            {
                "doc_id": [r[0] for r in doc_rows],
                "url": [r[1] for r in doc_rows],
                "status": [r[2] for r in doc_rows],
                "n_spans": [r[3] for r in doc_rows],
            },
            schema=pa.schema(
                [
                    ("doc_id", pa.string()),
                    ("url", pa.string()),
                    ("status", pa.int32()),
                    ("n_spans", pa.int32()),
                ]
            ),
        ),
        os.path.join(out, "expected_fetch_docs.parquet"),
    )

    # -- bloom_roundtrip: per-bucket build over seen, probe candidates ------
    seen = read_cols("seen.parquet", ["bucket", "url_hash"])
    cands = read_cols("candidates.parquet", ["bucket", "url_hash"])
    m, k = bloom.bloom_params(4096, 0.01)
    blobs: dict[int, bytes] = {}
    by_bucket: dict[int, list[int]] = {}
    for b, uh in zip(seen["bucket"], seen["url_hash"]):
        by_bucket.setdefault(int(b), []).append(uh)
    for b, hashes in by_bucket.items():
        blobs[b] = bloom.build_blob(np.asarray(hashes, dtype=np.int64), m, k)
    stats: dict[int, list[int]] = {}
    for b, uh in zip(cands["bucket"], cands["url_hash"]):
        s = stats.setdefault(int(b), [0, 0])
        s[0] += 1
        blob = blobs.get(int(b))
        if blob is not None and bool(
            bloom.probe_blob(np.asarray([uh], dtype=np.int64), blob, m, k)[0]
        ):
            s[1] += 1
    pq.write_table(
        pa.table(
            {
                "bucket": sorted(stats),
                "n_cands": [stats[b][0] for b in sorted(stats)],
                "n_maybe": [stats[b][1] for b in sorted(stats)],
            },
            schema=pa.schema(
                [
                    ("bucket", pa.int32()),
                    ("n_cands", pa.int64()),
                    ("n_maybe", pa.int64()),
                ]
            ),
        ),
        os.path.join(out, "expected_bloom_roundtrip.parquet"),
    )

    # -- media features + frame sample over the synthetic media universe ----
    mrows = media.synth_media_rows(500)
    feats = [media.features_of(ref, kind, payload) for ref, kind, payload, _ in mrows]
    pq.write_table(
        pa.table(
            {
                "media_ref": [f[0] for f in feats],
                "media_type": [f[1] for f in feats],
                "n_bytes": [f[2] for f in feats],
                "width": [f[3] for f in feats],
                "height": [f[4] for f in feats],
                "n_frames": [f[5] for f in feats],
                "byte_mean": [f[6] for f in feats],
                "content_hash": [f[7] for f in feats],
            },
            schema=pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("media_type", pa.string()),
                    ("n_bytes", pa.int32()),
                    ("width", pa.int32()),
                    ("height", pa.int32()),
                    ("n_frames", pa.int32()),
                    ("byte_mean", pa.string()),
                    ("content_hash", pa.string()),
                ]
            ),
        ),
        os.path.join(out, "expected_media_features.parquet"),
    )
    frames = [
        t
        for ref, _, payload, _ in mrows
        for t in media.frame_rows_of(ref, payload, every_n=5)
    ]
    pq.write_table(
        pa.table(
            {
                "media_ref": [f[0] for f in frames],
                "frame_idx": [f[1] for f in frames],
                "frame_hash": [f[2] for f in frames],
            },
            schema=pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("frame_idx", pa.int32()),
                    ("frame_hash", pa.string()),
                ]
            ),
        ),
        os.path.join(out, "expected_media_frames.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")
    return out


def materialize_cdc_fixture(sf_name: str) -> str:
    """Expected-output fixture for the CDC queries (additive, own marker —
    materialize_expected_fixtures' _DONE_EXPECTED predates it and never
    rewrites): the SAME pure core the Spark stage wraps
    (media.cdc_chunks_of) runs driver-side over the SAME deterministic
    mirror universe (media.synth_media_mirror_rows(500, 5)); DuckDB reads
    the parquet back, so the comparison checks the Arrow plumbing AND
    feeds the exact relational twin for the chunk-dedup aggregate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from . import media

    out = fixture_dir(sf_name)
    done = os.path.join(out, "_DONE_CDC")
    if os.path.exists(done):
        return out
    rows = []
    for ref, _kind, payload, _meta in media.synth_media_mirror_rows(500, 5):
        rows.extend(media.cdc_chunks_of(ref, payload))
    pq.write_table(
        pa.table(
            {
                "media_ref": [r[0] for r in rows],
                "chunk_idx": [r[1] for r in rows],
                "offset": [r[2] for r in rows],
                "length": [r[3] for r in rows],
                "chunk_hash": [r[4] for r in rows],
            },
            schema=pa.schema(
                [
                    ("media_ref", pa.string()),
                    ("chunk_idx", pa.int32()),
                    ("offset", pa.int32()),
                    ("length", pa.int32()),
                    ("chunk_hash", pa.string()),
                ]
            ),
        ),
        os.path.join(out, "expected_media_cdc.parquet"),
    )
    with open(done, "w") as f:
        f.write("ok\n")
    return out
