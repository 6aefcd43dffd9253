"""Sitemap family unit tests (crawlspark.sitemaps): parse edge cases
(malformed entries, missing optional fields, whitespace, multi-entry
ordering), recrawl scoring rules (never→0, missing lastmod→cap, cap
clamp, changefreq default), and plan hygiene (no shuffle in the parse
plan). Cross-engine value equality for the two driver queries is covered
by tests/test_driver_contract.py, which auto-picks every queries()
entry."""


import pytest

from crawlspark import sitemaps

XML = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> http://h0.example/a </loc>
    <lastmod>2026-07-31</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.9</priority>
  </url>
  <url><loc>http://h0.example/b</loc></url>
  <url>
    <lastmod>2026-01-01</lastmod>
  </url>
  <url>
    <loc>http://h0.example/c</loc>
    <changefreq>never</changefreq>
    <priority>1.0</priority>
  </url>
</urlset>
"""


@pytest.fixture()
def parsed(spark):
    sm = spark.createDataFrame([("h0.example", XML)], "host string, xml string")
    return sitemaps.parse_sitemaps(sm)


def test_parse_fields_and_defaults(parsed):
    rows = {r.loc: r for r in parsed.collect()}
    # malformed loc-less entry dropped
    assert set(rows) == {"http://h0.example/a", "http://h0.example/b", "http://h0.example/c"}
    a = rows["http://h0.example/a"]
    assert (a.lastmod_day, a.changefreq, a.priority) == ("2026-07-31", "daily", 0.9)
    # all optional fields absent → NULLs + protocol default priority
    b = rows["http://h0.example/b"]
    assert (b.lastmod_day, b.changefreq, b.priority) == (None, None, 0.5)
    # entry_pos preserves document order (the dropped entry still counts a slot)
    assert [rows[k].entry_pos for k in sorted(rows)] == [0, 1, 3]


def test_parse_is_shuffle_free(parsed):
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_recrawl_scores(spark, parsed):
    out = {
        r.loc: r.recrawl_score
        for r in sitemaps.recrawl_priority(parsed, now_day="2026-08-01").collect()
    }
    # daily, 1 day old: 0.9 * min(1/1, 8) = 0.9
    assert out["http://h0.example/a"] == pytest.approx(0.9)
    # no hints: default weekly + maximally-stale cap → 0.5 * 8
    assert out["http://h0.example/b"] == pytest.approx(4.0)
    # changefreq never → 0 regardless of priority
    assert out["http://h0.example/c"] == 0.0


def test_recrawl_cap_applies(spark):
    df = spark.createDataFrame(
        [("u1", "2020-01-01", "daily", 1.0)],
        "loc string, lastmod_day string, changefreq string, priority double",
    )
    row = sitemaps.recrawl_priority(df, now_day="2026-08-01").collect()[0]
    assert row.recrawl_score == sitemaps.AGE_RATIO_CAP


def test_recrawl_future_lastmod_clamps_to_zero(spark):
    df = spark.createDataFrame(
        [("u1", "2026-12-31", "daily", 1.0)],
        "loc string, lastmod_day string, changefreq string, priority double",
    )
    row = sitemaps.recrawl_priority(df, now_day="2026-08-01").collect()[0]
    assert row.recrawl_score == 0.0


def test_fixture_rows_deterministic():
    from crawlspark.fixtures import sitemap_rows, spec_for_sf

    spec = spec_for_sf("sf0.001")
    a, b = sitemap_rows(200, spec), sitemap_rows(200, spec)
    assert a == b
    hosts = [h for h, _ in a]
    assert hosts == sorted(hosts) and len(hosts) == len(set(hosts))
    # field-mix invariants the parse tests rely on: at least one of each
    joined = "".join(x for _, x in a)
    assert "<changefreq>never</changefreq>" in joined
    assert "<url>\n    <lastmod>2026-01-01</lastmod>\n  </url>" in joined


def test_entry_pos_matches_document_order(spark):
    # datelike ordering trap: entry_pos must be position, not sort order
    xml = (
        "<urlset>"
        + "".join(f"<url><loc>http://z.example/{9 - i}</loc></url>" for i in range(10))
        + "</urlset>"
    )
    sm = spark.createDataFrame([("z.example", xml)], "host string, xml string")
    rows = sitemaps.parse_sitemaps(sm).orderBy("entry_pos").collect()
    assert [r.loc for r in rows] == [f"http://z.example/{9 - i}" for i in range(10)]
    assert [r.entry_pos for r in rows] == list(range(10))


def test_recrawl_deterministic_now(spark, parsed):
    d1 = sitemaps.recrawl_priority(parsed, now_day="2026-08-01")
    d2 = sitemaps.recrawl_priority(parsed, now_day="2026-08-02")
    s1 = {r.loc: r.recrawl_score for r in d1.collect()}
    s2 = {r.loc: r.recrawl_score for r in d2.collect()}
    # one more day of age strictly increases any un-capped, non-never score
    assert s2["http://h0.example/a"] > s1["http://h0.example/a"]
    assert s2["http://h0.example/c"] == s1["http://h0.example/c"] == 0.0


def test_output_schema_has_no_date_types(parsed):
    """Cross-engine convention: no DATE-typed outputs (the driver hashes
    values; dates stay 'YYYY-MM-DD' strings end to end)."""
    dt = dict(parsed.dtypes)
    assert dt["lastmod_day"] == "string"
    scored = sitemaps.recrawl_priority(parsed, now_day="2026-08-01")
    assert dict(scored.dtypes)["recrawl_score"] == "double"


# ---------------------------------------------------------------------------
# snapshot_change_stats (the estimation half of the refresh scheduler)
# ---------------------------------------------------------------------------

SNAP_SCHEMA = "doc_id bigint, host string, text string"


def test_change_stats_classifies_all_statuses(spark):
    prev = spark.createDataFrame(
        [
            (1, "h0", "same"),
            (2, "h0", "old"),
            (3, "h0", "gone"),
            (10, "h1", "alpha"),
        ],
        SNAP_SCHEMA,
    )
    curr = spark.createDataFrame(
        [
            (1, "h0", "same"),
            (2, "h0", "new"),
            (4, "h0", "fresh"),
            (10, "h1", "alpha"),
        ],
        SNAP_SCHEMA,
    )
    out = {r.host: r for r in sitemaps.snapshot_change_stats(prev, curr).collect()}
    h0 = out["h0"]
    assert (h0.n_added, h0.n_removed, h0.n_changed, h0.n_unchanged) == (1, 1, 1, 1)
    assert h0.change_rate == 0.5 and h0.changefreq_class == "daily"
    h1 = out["h1"]
    assert (h1.n_added, h1.n_removed, h1.n_changed, h1.n_unchanged) == (0, 0, 0, 1)
    assert h1.change_rate == 0.0 and h1.changefreq_class == "yearly"


def test_change_stats_no_overlap_is_null_not_zero(spark):
    prev = spark.createDataFrame([(1, "h0", "a")], SNAP_SCHEMA)
    curr = spark.createDataFrame([(2, "h0", "b")], SNAP_SCHEMA)
    row = sitemaps.snapshot_change_stats(prev, curr).collect()[0]
    assert (row.n_added, row.n_removed) == (1, 1)
    # no page seen twice -> NULL rate and class (no evidence != stable)
    assert row.change_rate is None and row.changefreq_class is None


def test_change_stats_null_text_is_not_absence(spark):
    # a row whose text is NULL is still a PRESENT page: NULL->NULL is
    # unchanged, NULL->'x' is changed; neither is added/removed
    prev = spark.createDataFrame([(1, "h0", None), (2, "h0", None)], SNAP_SCHEMA)
    curr = spark.createDataFrame([(1, "h0", None), (2, "h0", "x")], SNAP_SCHEMA)
    row = sitemaps.snapshot_change_stats(prev, curr).collect()[0]
    assert (row.n_added, row.n_removed, row.n_changed, row.n_unchanged) == (0, 0, 1, 1)


def test_change_stats_class_boundaries(spark):
    # rate thresholds are inclusive: 0.5->daily, 0.2->weekly,
    # 0.05->monthly, below->yearly
    def mk(changed, unchanged, host, base):
        rows = []
        for i in range(changed):
            rows.append((base + i, host, "a", f"b{i}"))
        for i in range(unchanged):
            rows.append((base + 1000 + i, host, "s", "s"))
        return rows

    data = (
        mk(1, 1, "h_daily", 0)
        + mk(1, 4, "h_weekly", 10000)
        + mk(1, 19, "h_monthly", 20000)
        + mk(1, 24, "h_yearly", 30000)
    )
    prev = spark.createDataFrame(
        [(i, h, p) for i, h, p, _ in data], SNAP_SCHEMA
    )
    curr = spark.createDataFrame(
        [(i, h, c) for i, h, _, c in data], SNAP_SCHEMA
    )
    out = {r.host: r.changefreq_class for r in sitemaps.snapshot_change_stats(prev, curr).collect()}
    assert out == {
        "h_daily": "daily",
        "h_weekly": "weekly",
        "h_monthly": "monthly",
        "h_yearly": "yearly",
    }
