"""Scheduling-window properties (SURVEY.md §6.2.2): the salted two-phase
selection must equal the salt-free per-host top-B definition, and the
budget/deferral arithmetic must hold."""

from pyspark.sql import functions as F

from crawlspark import rank
from crawlspark.config import CrawlConfig
from crawlspark.schemas import FRONTIER
from crawlspark.xxh64 import hash_str


def _frontier_rows(n_per_host: dict[str, int]):
    rows = []
    for host, n in n_per_host.items():
        hh = hash_str(host)
        for i in range(n):
            url = f"http://{host}/u/{i}"
            rows.append(
                (
                    url,
                    hash_str(url),
                    host,
                    hh,
                    i % 3,          # priority
                    i % 5,          # depth
                    0,
                    0,
                    "pending",
                    4,              # host_budget
                    1,              # delay_slots
                )
            )
    return rows


def test_salted_equals_unsalted(spark):
    """One hot host with 50% of rows (the skew fixture shape) + cold hosts:
    forcing many salts must not change WHICH urls are selected."""
    rows = _frontier_rows(
        {"hot.example": 600, **{f"c{i}.example": 9 for i in range(40)}}
    )
    df = spark.createDataFrame(rows, FRONTIER)
    cfg = CrawlConfig(hot_threshold=16, max_salts=16, round_capacity=10**6)

    salted = rank.select_batch(df, None, cfg)
    got = sorted(
        (r["host_hash"], r["rank"], r["url"]) for r in salted.collect()
    )

    # salt-free definition, computed independently with plain python
    by_host: dict[int, list] = {}
    for (url, uh, host, hh, prio, depth, _dr, _nb, _s, _hb, _ds) in rows:
        by_host.setdefault(hh, []).append((prio, depth, uh, url))
    want = []
    b = cfg.max_fetches_per_host_per_round
    for hh, entries in by_host.items():
        entries.sort()
        for i, e in enumerate(entries[:b]):
            want.append((hh, i + 1, e[3]))
    assert got == sorted(want)

    # every host respects its budget
    per_host = salted.groupBy("host_hash").count().collect()
    assert all(r["count"] <= b for r in per_host)


def test_hot_host_gets_salted(spark):
    rows = _frontier_rows({"hot.example": 600, "cold.example": 3})
    df = spark.createDataFrame(rows, FRONTIER)
    cfg = CrawlConfig(hot_threshold=16, max_salts=16)
    stats = rank.host_stats(df, cfg).collect()
    by = {r["host_hash"]: r["n_salts"] for r in stats}
    assert by[hash_str("hot.example")] == 16
    assert by[hash_str("cold.example")] == 1


def test_cap_round_deterministic_prefix(spark):
    rows = _frontier_rows({f"h{i}.example": 5 for i in range(20)})
    df = spark.createDataFrame(rows, FRONTIER)
    cfg = CrawlConfig(round_capacity=7)
    sel = rank.select_batch(df, None, cfg)
    capped = rank.with_seq(rank.cap_round(sel, cfg)).collect()
    assert len(capped) == 7
    # capped set == first 7 of the full emission order
    full = rank.with_seq(
        rank.cap_round(sel, CrawlConfig(round_capacity=10**6))
    ).collect()
    want = sorted(full, key=lambda r: r["seq"])[:7]
    assert [(r["seq"], r["url"]) for r in sorted(capped, key=lambda r: r["seq"])] == [
        (r["seq"], r["url"]) for r in want
    ]


def test_with_seq_scalable_matches_window(spark):
    rows = _frontier_rows({f"h{i}.example": 7 for i in range(30)})
    df = spark.createDataFrame(rows, FRONTIER)
    cfg = CrawlConfig(round_capacity=None)
    sel = rank.select_batch(df, None, cfg)
    a = {(r["url"], r["seq"]) for r in rank.with_seq(sel, scalable=False).collect()}
    b = {(r["url"], r["seq"]) for r in rank.with_seq(sel, scalable=True).collect()}
    assert a == b
