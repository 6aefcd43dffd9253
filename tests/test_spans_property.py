"""Property tests for span-order fidelity (X4) and robots fetch parity (S7)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from crawlspark.robots import fetch_robots_df, robots_table_df
from crawlspark.schemas import DOCUMENTS_SPANS_FIXTURE

span_st = st.fixed_dictionaries(
    {
        "kind": st.sampled_from(["text", "link", "image", "video"]),
        "text": st.text(max_size=8),
        "media_ref": st.one_of(st.none(), st.text(max_size=16)),
    }
)


@given(st.lists(st.lists(span_st, max_size=6), min_size=1, max_size=5))
@settings(max_examples=10, deadline=None)
def test_posexplode_preserves_arbitrary_span_order(spark, docs):
    rows = []
    for i, spans in enumerate(docs):
        withoff = [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "offset": j}
            for j, s in enumerate(spans)
        ]
        rows.append((f"d{i}", withoff))
    df = spark.createDataFrame(rows, DOCUMENTS_SPANS_FIXTURE)
    got = (
        df.select("doc_id", F.posexplode("spans").alias("pos", "s"))
        .select("doc_id", "pos", "s.kind", "s.text", "s.media_ref", "s.offset")
        .collect()
    )
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, spans in enumerate(docs):
        rows_i = sorted(by_doc.get(f"d{i}", []), key=lambda r: r["pos"])
        assert [r["pos"] for r in rows_i] == list(range(len(spans)))
        assert all(r["pos"] == r["offset"] for r in rows_i)
        assert [(r["kind"], r["text"], r["media_ref"]) for r in rows_i] == [
            (s["kind"], s["text"], s["media_ref"]) for s in spans
        ]


def test_distributed_robots_fetch_matches_table(spark):
    hosts = [f"h{k}.example" for k in range(40)]
    table = {r["host"]: r for r in robots_table_df(spark, hosts).collect()}
    hosts_df = spark.createDataFrame([(h,) for h in hosts], "host string")
    fetched = {r["host"]: r for r in fetch_robots_df(hosts_df).collect()}
    assert set(table) == set(fetched)
    for h in hosts:
        assert tuple(table[h]) == tuple(fetched[h])
