"""Focused test for candidates._partial_dedup — the round-8 map-side
combine inside the fused Arrow pass.

The invariant: applying _partial_dedup per Arrow batch and THEN the
global (bucket, url_hash) aggregate of candidate_rows (min every column,
max maybe_seen, strings under BINARY collation = UTF-8 byte order) must
equal the global aggregate applied directly to the raw link rows. min is
associative, so any batch split must give identical winners — including
non-ASCII / astral-plane strings, where the partial min must follow
Spark's byte-wise string order, not locale or code-unit order.
"""

import numpy as np
import pandas as pd
import pytest

from crawlspark.candidates import _partial_dedup


def _raw_batch(relational: bool) -> pd.DataFrame:
    # Three duplicate groups + one singleton; strings deliberately
    # non-ASCII (é, astral 𐍈/😀, combining chars) so byte order matters.
    rows = [
        # url_hash 11: three dupes, distinct urls/priorities/depths
        ("http://h0.example/aé", 11, "h0.example", 5, 3, 2, True),
        ("http://h0.example/a\U0001f600", 11, "h0.example", 5, 1, 4, False),
        ("http://h0.example/a\U00010348", 11, "h0.example", 5, 2, 3, False),
        # url_hash 7: two dupes, maybe_seen both False
        ("http://h1.example/zz", 7, "h1.example", 9, 7, 1, False),
        ("http://h1.example/za", 7, "h1.example", 9, 6, 9, False),
        # url_hash 40: singleton
        ("http://h2.example/q", 40, "h2.example", 3, 0, 0, True),
        # url_hash 7 again (same group split across list order)
        ("http://h1.example/yÅ", 7, "h1.example", 9, 8, 2, True),
    ]
    df = pd.DataFrame(
        rows,
        columns=[
            "url", "url_hash", "host", "host_hash", "priority",
            "crawl_depth", "maybe_seen",
        ],
    )
    df["url_hash"] = df["url_hash"].astype("int64")
    df["host_hash"] = df["host_hash"].astype("int64")
    df["priority"] = df["priority"].astype("int32")
    df["crawl_depth"] = df["crawl_depth"].astype("int32")
    df["bucket"] = (df["url_hash"] % 4).astype("int32")
    if relational:
        df["path"] = ["/" + u.split("/", 3)[-1] for u in df["url"]]
    return df


def _global_agg(df: pd.DataFrame) -> pd.DataFrame:
    """The downstream candidate_rows aggregate, computed with BINARY
    (UTF-8 byte) string order — Spark's collation for min(string)."""
    out = []
    for uh, g in sorted(df.groupby("url_hash"), key=lambda kv: kv[0]):
        out.append(
            {
                "url_hash": uh,
                "url": min(g["url"], key=lambda s: s.encode("utf-8")),
                "host": min(g["host"], key=lambda s: s.encode("utf-8")),
                "host_hash": g["host_hash"].min(),
                "priority": g["priority"].min(),
                "crawl_depth": g["crawl_depth"].min(),
                "bucket": g["bucket"].min(),
                "maybe_seen": bool(g["maybe_seen"].max()),
            }
        )
    return pd.DataFrame(out)


@pytest.mark.parametrize("relational", [False, True])
@pytest.mark.parametrize("split", [1, 2, 3, 7])
def test_partial_then_global_equals_global(relational, split):
    raw = _raw_batch(relational)
    expect = _global_agg(raw)

    # Split the raw rows into `split` Arrow-batch-like chunks, partial
    # dedup each, re-concatenate, then apply the global aggregate.
    bounds = np.linspace(0, len(raw), split + 1).astype(int)
    chunks = [raw.iloc[a:b] for a, b in zip(bounds[:-1], bounds[1:])]
    parts = [_partial_dedup(c.reset_index(drop=True), relational) for c in chunks]
    combined = pd.concat(parts, ignore_index=True)
    got = _global_agg(combined)

    cols = ["url_hash", "url", "host", "host_hash", "priority",
            "crawl_depth", "bucket", "maybe_seen"]
    pd.testing.assert_frame_equal(
        got[cols].reset_index(drop=True), expect[cols].reset_index(drop=True)
    )


def test_partial_dedup_winners_and_dtypes():
    raw = _raw_batch(relational=True)
    out = _partial_dedup(raw, relational=True)

    # One row per url_hash, deterministic byte-order winners.
    assert sorted(out["url_hash"]) == [7, 11, 40]
    g11 = out[out["url_hash"] == 11].iloc[0]
    # U+00E9 (C3 A9) < U+10348 (F0 90 8D 88) < U+1F600 (F0 9F 98 80)
    assert g11["url"] == "http://h0.example/aé"
    assert g11["priority"] == 1 and g11["crawl_depth"] == 2
    assert bool(g11["maybe_seen"]) is True  # max over {True, False, False}
    g7 = out[out["url_hash"] == 7].iloc[0]
    assert g7["url"] == "http://h1.example/yÅ"  # 'yA◌̊' < 'za' < 'zz'
    assert g7["path"] == min(
        raw[raw["url_hash"] == 7]["path"], key=lambda s: s.encode("utf-8")
    )
    assert bool(g7["maybe_seen"]) is True

    # Arrow-schema-critical dtypes survive the groupby round-trip.
    assert out["url_hash"].dtype == np.dtype("int64")
    assert out["host_hash"].dtype == np.dtype("int64")
    assert out["priority"].dtype == np.dtype("int32")
    assert out["crawl_depth"].dtype == np.dtype("int32")
    assert out["bucket"].dtype == np.dtype("int32")
    assert out["maybe_seen"].dtype == np.dtype("bool")
    assert out["url"].map(type).eq(str).all()


def test_partial_dedup_no_duplicates_is_identity():
    raw = _raw_batch(relational=False)
    uniq = raw.drop_duplicates("url_hash", keep="first").reset_index(drop=True)
    out = _partial_dedup(uniq, relational=False)
    pd.testing.assert_frame_equal(out, uniq)
    # Empty and single-row batches pass through untouched too.
    empty = uniq.iloc[0:0]
    pd.testing.assert_frame_equal(_partial_dedup(empty, False), empty)
    one = uniq.iloc[0:1]
    pd.testing.assert_frame_equal(_partial_dedup(one, False), one)
