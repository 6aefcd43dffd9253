"""Sitemap ingestion + freshness-driven recrawl scheduling.

A production crawler discovers URLs from two places: extracted links
(linkgraph.py / parse.py) and the hosts' own sitemaps. This module adds
the sitemap side of the intake path plus the recrawl scheduler those
sitemap freshness hints feed (Cho & Garcia-Molina, "Effective Page
Refresh Policies for Web Crawlers", TODS 2003 — the classic
age/change-frequency formulation, simplified to the uniform-allocation
policy that is expressible as one scan).

Everything is pure JVM (built-in functions, no Python UDFs) and
oracle-mirrored in DuckDB SQL (__spark_entry__.py):

- ``parse_sitemaps``: (host, xml) rows → one ``<url>`` entry per output
  row with loc / lastmod day / changefreq / priority extracted by
  non-greedy regex (both Java regex and DuckDB's RE2 support ``(.*?)``).
  Scale shape: regexp_extract_all + posexplode is a linear per-row scan —
  the per-host sitemap payload is bounded (50k URLs per sitemap file by
  the protocol's own limit), so no row explodes beyond that bound; no
  shuffle at all. Malformed entries (no <loc>) are dropped; missing
  optional fields default per the sitemaps.org protocol (changefreq
  'weekly'-equivalent handling is left to the scheduler; priority 0.5).
- ``recrawl_priority``: for each known URL with (last_crawl_day,
  changefreq, priority) compute a deterministic recrawl score
      score = priority * min(age_days / interval_days, 8.0)
  where interval_days maps changefreq (always=0.5, hourly=1/24 → floored
  to 0.5, daily=1, weekly=7, monthly=30, yearly=365, never=+inf → score
  0) and the ratio is capped so long-dead pages cannot starve everything
  else (the cap is the uniform-allocation clamp from the paper's
  conclusion that proportional-to-change-rate over-allocates to churners).
  Pure per-row arithmetic — no shuffle; the optional per-host top-k uses
  the repo's standard two-phase salted window only when asked.

The crawl loop consumes ``parse_sitemaps`` output as an extra seed
source (opt-in, like cfg.host_boosts): sitemap locs are canonicalized and
anti-joined against seen exactly like extracted links, so the equality
guarantees (ordering, seen-set) are untouched when the flag is off.

Float discipline: scores round(·, 6) at the OUTPUT only, matching the
repo-wide cross-engine convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Protocol changefreq → recrawl interval in days. 'never' maps to NULL
# (score 0 downstream). Floor at 0.5 day: this scheduler runs in rounds,
# sub-round intervals are indistinguishable, and 'always'/'hourly'
# collapsing to the same bucket is the documented uniform-allocation
# clamp (module docstring).
CHANGEFREQ_DAYS: dict[str, float] = {
    "always": 0.5,
    "hourly": 0.5,
    "daily": 1.0,
    "weekly": 7.0,
    "monthly": 30.0,
    "yearly": 365.0,
}

# Cap on age/interval so dead-and-gone pages cannot monopolize the
# recrawl budget (uniform-allocation clamp).
AGE_RATIO_CAP = 8.0


def parse_sitemaps(sm: DataFrame, host_col: str = "host", xml_col: str = "xml") -> DataFrame:
    """(host, xml) → (host, loc, lastmod_day, changefreq, priority).

    One <url> entry per row; entries without a <loc> are dropped.
    lastmod_day is the protocol's YYYY-MM-DD prefix as a date (NULL when
    absent/malformed), priority defaults to 0.5 per sitemaps.org.

    Plan shape: regexp_extract_all → posexplode → 4 regexp_extract — a
    single narrow scan stage, whole-stage codegen end to end, no shuffle.
    """
    entries = sm.select(
        F.col(host_col).alias("host"),
        F.posexplode_outer(
            F.regexp_extract_all(F.col(xml_col), F.lit(r"(?s)<url>(.*?)</url>"), 1)
        ).alias("entry_pos", "entry"),
    )
    loc = F.regexp_extract("entry", r"<loc>\s*(.*?)\s*</loc>", 1)
    lastmod = F.regexp_extract("entry", r"<lastmod>\s*(\d{4}-\d{2}-\d{2})", 1)
    changefreq = F.regexp_extract("entry", r"<changefreq>\s*(.*?)\s*</changefreq>", 1)
    priority = F.regexp_extract("entry", r"<priority>\s*(.*?)\s*</priority>", 1)
    return (
        entries.where(F.col("entry").isNotNull())
        .select(
            "host",
            F.col("entry_pos").cast("int").alias("entry_pos"),
            loc.alias("loc"),
            # kept as the protocol's 'YYYY-MM-DD' TEXT (cross-engine value
            # convention: no DATE-typed outputs; consumers to_date() it)
            F.when(lastmod != "", lastmod).alias("lastmod_day"),
            F.when(changefreq != "", changefreq).alias("changefreq"),
            F.coalesce(
                F.when(priority != "", priority.cast("double")), F.lit(0.5)
            ).alias("priority"),
        )
        .where(F.col("loc") != "")
    )


def sitemap_seed_candidates(sm: DataFrame) -> DataFrame:
    """(host, xml) sitemap table → extra seed rows (url, priority,
    crawl_depth) for ``round.init_crawl(..., sitemaps_df=...)``.

    Sitemap priority p ∈ [0,1] (1 = most important) quantizes onto the
    crawl's ascending priority scale as ``floor((1-p)*10 + 0.5)`` ∈ 0..10
    — explicit-midpoint flooring, NOT round(): Python's round() is
    banker's and Spark's is HALF_UP, so the floor form is the one
    quantizer that is bit-identical on IEEE doubles in both the engine
    and the pure-Python oracle. Explicit seeds keep priority 0, so a URL
    listed both ways resolves to the seed's priority via the A2
    min-dedup — in both engines. crawl_depth 0: sitemap locs are roots of
    discovery, like seeds."""
    parsed = parse_sitemaps(sm)
    return parsed.select(
        F.col("loc").alias("url"),
        F.floor((F.lit(1.0) - F.col("priority")) * F.lit(10.0) + F.lit(0.5))
        .cast("int")
        .alias("priority"),
        F.lit(0).alias("crawl_depth"),
    )


def parse_entries_py(xml: str) -> list[tuple[str, str | None, str | None, float]]:
    """Pure-Python twin of ``parse_sitemaps`` for the crawl oracle:
    (loc, lastmod_day, changefreq, priority) per well-formed entry, same
    regexes verbatim (Java regex, RE2 and Python ``re`` agree on ``(?s)``
    + non-greedy groups over this grammar). Shared with oracle/simulator
    as an environment definition — the RELATIONAL parse is independently
    verified against DuckDB by the sitemap_extract driver query, so
    sharing the Python form does not test an operator against itself."""
    import re

    out = []
    for m in re.finditer(r"(?s)<url>(.*?)</url>", xml):
        entry = m.group(1)
        loc_m = re.search(r"<loc>\s*(.*?)\s*</loc>", entry)
        if not loc_m or loc_m.group(1) == "":
            continue
        lm = re.search(r"<lastmod>\s*(\d{4}-\d{2}-\d{2})", entry)
        cf = re.search(r"<changefreq>\s*(.*?)\s*</changefreq>", entry)
        pr = re.search(r"<priority>\s*(.*?)\s*</priority>", entry)
        priority = 0.5
        if pr and pr.group(1) != "":
            try:
                priority = float(pr.group(1))
            except ValueError:  # TRY_CAST semantics
                priority = 0.5
        out.append(
            (
                loc_m.group(1),
                lm.group(1) if lm else None,
                cf.group(1) if cf and cf.group(1) != "" else None,
                priority,
            )
        )
    return out


def seed_priority_py(sitemap_priority: float) -> int:
    """Pure-Python twin of the ``sitemap_seed_candidates`` quantizer."""
    import math

    return int(math.floor((1.0 - sitemap_priority) * 10.0 + 0.5))


# Observed-change-rate → changefreq class thresholds (descending). The
# class feeds recrawl_priority's CHANGEFREQ_DAYS, closing the estimate →
# schedule loop; boundaries are halfway (in rate space) between the
# 1/interval rates of adjacent classes.
CHANGE_RATE_CLASSES: tuple[tuple[float, str], ...] = (
    (0.5, "daily"),
    (0.2, "weekly"),
    (0.05, "monthly"),
    (0.0, "yearly"),
)


def snapshot_change_stats(
    prev: DataFrame,
    curr: DataFrame,
    key: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Per-host content-change statistics between two crawl snapshots —
    the ESTIMATION half of Cho & Garcia-Molina refresh scheduling
    (``recrawl_priority`` is the allocation half; its changefreq input
    can come from sitemap hints OR from this operator's observed class).

    One full-outer join on the page key classifies every page as
    added / removed / changed / unchanged (null-safe exact text equality
    keyed on explicit row-presence flags, so NULL text never masquerades
    as an absent row — at the 100 TB design point substitute a stored
    content hash for the text column; the join shape is identical), then
    one per-host aggregate.
    change_rate = changed / (changed + unchanged) over pages seen in BOTH
    snapshots (round(·,6)); NULL (not 0) when no page was seen twice —
    no evidence is not evidence of stability. changefreq_class maps the
    rate through CHANGE_RATE_CLASSES.

    Scale shape: shuffle join on the page key (co-partitioned, AQE
    skew-splittable) + one map-side-combinable host aggregate; nothing
    corpus-derived is broadcast or collected."""
    p = prev.select(
        F.col(key).alias("k"),
        F.col(host_col).alias("p_host"),
        F.col(text_col).alias("p_text"),
        F.lit(True).alias("p_present"),
    )
    c = curr.select(
        F.col(key).alias("k"),
        F.col(host_col).alias("c_host"),
        F.col(text_col).alias("c_text"),
        F.lit(True).alias("c_present"),
    )
    j = p.join(c, "k", "full_outer").select(
        F.coalesce("c_host", "p_host").alias("host"),
        F.when(F.col("p_present").isNull(), F.lit("added"))
        .when(F.col("c_present").isNull(), F.lit("removed"))
        .when(F.col("p_text").eqNullSafe(F.col("c_text")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
    cnt = lambda s: F.sum(F.when(F.col("status") == s, 1).otherwise(0)).cast("bigint")  # noqa: E731
    agg = j.groupBy("host").agg(
        cnt("added").alias("n_added"),
        cnt("removed").alias("n_removed"),
        cnt("changed").alias("n_changed"),
        cnt("unchanged").alias("n_unchanged"),
    )
    seen_twice = F.col("n_changed") + F.col("n_unchanged")
    rate = F.when(
        seen_twice > 0, F.round(F.col("n_changed") / seen_twice, 6)
    )
    klass = F.when(
        seen_twice > 0,
        F.coalesce(
            *[
                F.when(rate >= lo, F.lit(name))
                for lo, name in CHANGE_RATE_CLASSES[:-1]
            ],
            F.lit(CHANGE_RATE_CLASSES[-1][1]),
        ),
    )
    return agg.withColumn("change_rate", rate).withColumn(
        "changefreq_class", klass
    )


# Observed-changefreq interval multipliers in ×4 fixed point (so the due
# test is pure integer arithmetic, bit-equal in Spark / Python / DuckDB):
# interval_rounds ×4 = recrawl_interval × mult4. daily ½×, weekly 1×,
# monthly 4×, yearly 8× — the four classes CHANGE_RATE_CLASSES emits.
RECRAWL_CLASS_MULT4: tuple[tuple[str, int], ...] = (
    ("daily", 2),
    ("weekly", 4),
    ("monthly", 16),
    ("yearly", 32),
)


def recrawl_mult4_col(n_changed, n_unchanged) -> "F.Column":
    """Host-level ×4 interval multiplier from accumulated refetch-pair
    counts: rate = changed/(changed+unchanged) → CHANGE_RATE_CLASSES →
    RECRAWL_CLASS_MULT4. No pairs (no URL refetched yet) defaults to
    'weekly' (×4 = base interval) — no evidence is not evidence of
    stability (snapshot_change_stats discipline). The rate is one double
    division compared against literal thresholds — IEEE-identical in
    Spark, Python and DuckDB, so the class (and hence the integer
    multiplier) is cross-engine exact."""
    pairs = n_changed + n_unchanged
    rate = n_changed / pairs
    mult = dict(RECRAWL_CLASS_MULT4)
    klass = F.coalesce(
        *[
            F.when(rate >= lo, F.lit(mult[name]))
            for lo, name in CHANGE_RATE_CLASSES[:-1]
        ],
        F.lit(mult[CHANGE_RATE_CLASSES[-1][1]]),
    )
    return F.when(pairs > 0, klass).otherwise(
        F.lit(mult["weekly"])
    ).cast("int")


def recrawl_due(state: DataFrame, r: int, interval: int) -> DataFrame:
    """Mark which recrawl_state rows are due for re-enqueue at round ``r``
    (the allocation half of the closed refresh loop, observed-signal
    variant — config.py `recrawl_every`): per-host change evidence →
    interval class (``recrawl_mult4_col``), then
        due ⇔ enqueued_round IS NULL ∧ 4·(r − last_fetch_round) ≥
              interval · mult4
    — uniform allocation in ×4 fixed-point integers, no float ages. The
    enqueued_round latch (set by the caller on due rows, cleared by the
    state merge on the next 200 fetch) guarantees a URL is never in the
    frontier twice.

    Input columns: host_hash, last_fetch_round, n_changed, n_unchanged,
    enqueued_round. Output: input + (recrawl_mult4 int, due boolean).

    Scale shape: one map-side-combinable host aggregate + one shuffle join
    back on host_hash (host-cardinality right side, AQE-broadcastable);
    the due test is per-row arithmetic. Nothing collects."""
    agg = state.groupBy("host_hash").agg(
        F.sum("n_changed").alias("_ch"), F.sum("n_unchanged").alias("_un")
    )
    j = state.join(
        agg.select(
            "host_hash",
            recrawl_mult4_col(F.col("_ch"), F.col("_un")).alias(
                "recrawl_mult4"
            ),
        ),
        "host_hash",
        "left",
    )
    due = F.col("enqueued_round").isNull() & (
        F.lit(4) * (F.lit(int(r)) - F.col("last_fetch_round"))
        >= F.lit(int(interval)) * F.col("recrawl_mult4")
    )
    return j.withColumn("due", due)


def recrawl_state_merge(
    prev: DataFrame | None,
    fetched: DataFrame,
    r: int,
    keep_new_marker: bool = False,
) -> DataFrame:
    """Fold round ``r``'s fetch outcomes into the recrawl_state table
    (config.py `recrawl_every`; the estimation half of the refresh loop).

    ``fetched``: one row per fetched URL this round — (url_hash, url,
    host, host_hash, priority, crawl_depth, status, fingerprint) with
    fingerprint non-NULL iff status 200. Rules (oracle/simulator.py
    mirrors them verbatim):
    - state row fetched this round: last_fetch_round ← r; on a 200 the
      fingerprint comparison accrues one changed/unchanged pair, the
      fingerprint updates, and the enqueued_round latch clears; on a 304
      (cfg.conditional_fetch revalidation) the unchanged pair accrues,
      the fingerprint keeps, and the latch clears — 304 == 200-unchanged
      for state purposes; any other refetch status only stamps the visit
      (counts/fingerprint/latch keep).
    - 200 fetch of a URL not yet in state: fresh row (zero pairs).
    - non-200 fetch of an unknown URL: not tracked (first sighting failed
      — the retry queue owns transient failures, not the refresh loop).
    - unfetched state rows carry over unchanged.

    Scale shape: one full-outer shuffle join keyed on url_hash —
    O(state + batch), same key the seen path shuffles on, AQE
    skew-splittable; no broadcasts, no collects. The WRITE side is the
    caller's engine choice (cfg.recrawl_delta, round.py): the stored
    engine rewrites the table whole per round (columnar,
    O(fetched-corpus)); the delta engine feeds this merge a
    semi-join-restricted ``prev`` so the output IS the changed-row set —
    O(batch) written per round, resolved merge-on-read with round-stamped
    versions (SnapshotStore.read_recrawl), compacted on the frontier-base
    cadence. That is the parquet-engine expression of Iceberg MERGE INTO
    on the url_hash key (iceberg_store.py seam). ``keep_new_marker``
    appends a transient ``_is_new`` boolean (first-200 rows) the delta
    engine's row counter observes; callers drop it before writing."""
    f = fetched.select(
        F.col("url_hash").alias("f_url_hash"),
        F.col("url").alias("f_url"),
        F.col("host").alias("f_host"),
        F.col("host_hash").alias("f_host_hash"),
        F.col("priority").alias("f_priority"),
        F.col("crawl_depth").alias("f_crawl_depth"),
        F.col("status").alias("f_status"),
        F.col("fingerprint").alias("f_fingerprint"),
        F.lit(True).alias("f_present"),
    )
    if prev is None:
        ok = f.filter(F.col("f_status") == 200)
        out0 = ok.select(
            F.col("f_url_hash").alias("url_hash"),
            F.col("f_url").alias("url"),
            F.col("f_host").alias("host"),
            F.col("f_host_hash").alias("host_hash"),
            F.col("f_priority").cast("int").alias("priority"),
            F.col("f_crawl_depth").cast("int").alias("crawl_depth"),
            F.lit(int(r)).cast("int").alias("last_fetch_round"),
            F.col("f_fingerprint").alias("fingerprint"),
            F.lit(0).cast("long").alias("n_changed"),
            F.lit(0).cast("long").alias("n_unchanged"),
            F.lit(None).cast("int").alias("enqueued_round"),
        )
        return (
            out0.withColumn("_is_new", F.lit(True)) if keep_new_marker else out0
        )
    p = prev.withColumn("p_present", F.lit(True))
    j = p.join(
        f, p["url_hash"] == f["f_url_hash"], "full_outer"
    )
    in_prev = F.col("p_present").isNotNull()
    got200 = F.col("f_present").isNotNull() & (F.col("f_status") == 200)
    # 304 Not Modified (cfg.conditional_fetch): the server-side validator
    # check stands in for a 200-unchanged — accrue the unchanged pair,
    # keep the stored fingerprint, clear the latch. A 304 can only arrive
    # for a URL already in state (the validator IS the state fingerprint);
    # an unknown 304 has no prev row and drops with the filter below.
    got304 = F.col("f_present").isNotNull() & (F.col("f_status") == 304)
    fetched_any = F.col("f_present").isNotNull()
    changed = ~F.col("f_fingerprint").eqNullSafe(F.col("fingerprint"))
    out = j.filter(in_prev | got200).select(
        F.coalesce(F.col("url_hash"), F.col("f_url_hash")).alias("url_hash"),
        F.coalesce(F.col("url"), F.col("f_url")).alias("url"),
        F.coalesce(F.col("host"), F.col("f_host")).alias("host"),
        F.coalesce(F.col("host_hash"), F.col("f_host_hash")).alias(
            "host_hash"
        ),
        F.coalesce(F.col("priority"), F.col("f_priority"))
        .cast("int")
        .alias("priority"),
        F.coalesce(F.col("crawl_depth"), F.col("f_crawl_depth"))
        .cast("int")
        .alias("crawl_depth"),
        F.when(fetched_any, F.lit(int(r)))
        .otherwise(F.col("last_fetch_round"))
        .cast("int")
        .alias("last_fetch_round"),
        F.when(got200, F.col("f_fingerprint"))
        .otherwise(F.col("fingerprint"))
        .alias("fingerprint"),
        (
            F.coalesce(F.col("n_changed"), F.lit(0))
            + F.when(got200 & in_prev & changed, F.lit(1)).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_changed"),
        (
            F.coalesce(F.col("n_unchanged"), F.lit(0))
            + F.when(
                (got200 & in_prev & ~changed) | (got304 & in_prev), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_unchanged"),
        F.when(got200 | got304, F.lit(None).cast("int"))
        .otherwise(F.col("enqueued_round"))
        .cast("int")
        .alias("enqueued_round"),
        # transient accounting marker (delta engine's state-row counter);
        # callers drop it before any write/compare
        *((((~in_prev) & got200).alias("_is_new"),) if keep_new_marker else ()),
    )
    return out


def recrawl_priority(
    pages: DataFrame,
    now_day: str,
    loc_col: str = "loc",
    lastmod_col: str = "lastmod_day",
    changefreq_col: str = "changefreq",
    priority_col: str = "priority",
) -> DataFrame:
    """Deterministic freshness score per page (module docstring formula).

    ``now_day`` is an explicit 'YYYY-MM-DD' constant — determinism rule:
    no wall-clock reads inside operators; callers stamp time.

    NULL lastmod ⇒ never crawled/no hint ⇒ treated as maximally stale
    (age ratio at the cap). changefreq 'never' ⇒ score 0. Unknown/missing
    changefreq defaults to weekly (the protocol calls the field a hint).
    Pure per-row arithmetic: no shuffle, fully pushdown-friendly.
    """
    interval = F.coalesce(
        *[
            F.when(F.col(changefreq_col) == k, F.lit(v))
            for k, v in CHANGEFREQ_DAYS.items()
        ],
        F.lit(CHANGEFREQ_DAYS["weekly"]),
    )
    age = F.datediff(
        F.to_date(F.lit(now_day)), F.to_date(F.col(lastmod_col))
    ).cast("double")
    ratio = F.when(F.col(lastmod_col).isNull(), F.lit(AGE_RATIO_CAP)).otherwise(
        F.least(F.greatest(age, F.lit(0.0)) / interval, F.lit(AGE_RATIO_CAP))
    )
    score = F.when(F.col(changefreq_col) == "never", F.lit(0.0)).otherwise(
        F.col(priority_col) * ratio
    )
    return pages.withColumn("recrawl_score", F.round(score, 6))
