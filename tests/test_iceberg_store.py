"""Iceberg engine behind the SnapshotStore seam (VERDICT r01 item 2/8):
no runtime jar exists in this sandbox, so the engine is verified at the
SQL-generation layer (every statement it would execute) plus seam
compatibility (API parity with the parquet engine) and the fail-fast gate.
"""

import inspect

import pytest

from crawlspark import iceberg_store as ice
from crawlspark.io_tables import SnapshotStore, iceberg_available

CAT, NS = "ice", "crawl"


def test_ddl_seen_is_bucket_partitioned():
    sql = ice.create_table_sql(CAT, NS, "seen", n_buckets=64)
    assert "CREATE TABLE IF NOT EXISTS ice.crawl.seen" in sql
    assert "USING iceberg" in sql
    assert "PARTITIONED BY (round, bucket(64, url_hash))" in sql


def test_ddl_round_partitioned_tables():
    sql = ice.create_table_sql(CAT, NS, "frontier")
    assert "PARTITIONED BY (round)" in sql and "USING iceberg" in sql


def test_round_overwrite_and_append():
    assert (
        ice.overwrite_round_sql(CAT, NS, "crawl_order", "v")
        == "INSERT OVERWRITE ice.crawl.crawl_order SELECT * FROM v"
    )
    assert ice.append_sql(CAT, NS, "seen", "v") == (
        "INSERT INTO ice.crawl.seen SELECT * FROM v"
    )


def test_merge_frontier_is_row_level():
    sql = ice.merge_frontier_sql(CAT, NS, "u")
    assert sql.startswith("MERGE INTO ice.crawl.frontier t USING u")
    assert "ON t.url_hash = u.url_hash" in sql
    assert "WHEN MATCHED AND u.op = 'delete' THEN DELETE" in sql
    assert (
        "WHEN MATCHED AND u.op = 'defer' THEN "
        "UPDATE SET t.not_before_round = u.not_before_round" in sql
    )
    assert "WHEN NOT MATCHED AND u.op = 'insert' THEN INSERT *" in sql


def test_reads_and_time_travel():
    assert (
        ice.read_round_sql(CAT, NS, "frontier", 7)
        == "SELECT * FROM ice.crawl.frontier WHERE round = 7"
    )
    assert (
        ice.read_seen_upto_sql(CAT, NS, 3)
        == "SELECT url_hash, url, bucket FROM ice.crawl.seen WHERE round <= 3"
    )
    assert (
        ice.read_version_sql(CAT, NS, "seen", 123456)
        == "SELECT * FROM ice.crawl.seen VERSION AS OF 123456"
    )


def test_commit_round_escapes_info():
    sql = ice.commit_round_sql(CAT, NS, 2, {"note": "it's fine", "new": 5})
    assert "INSERT INTO ice.crawl.rounds" in sql
    assert "it''s fine" in sql  # single quotes doubled
    assert '""new"": 5' not in sql  # plain JSON, not double-escaped


def test_commit_round_escapes_backslashes():
    """A JSON payload with an embedded double quote serializes as \\" — Spark
    SQL string literals interpret backslash escapes, so the generated literal
    must double the backslash or read_manifest's json.loads fails."""
    import json

    info = {"note": 'a "quoted" value', "path": "C:\\tmp"}
    sql = ice.commit_round_sql(CAT, NS, 3, info)
    lit = sql.split("'")[1]  # the payload literal body
    # undo Spark's literal unescaping (\\ -> \) and quote-doubling ('' -> ')
    restored = lit.replace("\\\\", "\\").replace("''", "'")
    assert json.loads(restored) == info


def test_overwrite_requires_dynamic_partition_mode():
    """The SQL-fallback path (writer_v2=False) uses an un-specced INSERT
    OVERWRITE — correct ONLY under dynamic partitionOverwriteMode (static
    mode truncates the whole table). The fallback enabler must set AND
    verify the conf, and the session-global side effect must be gated
    behind the fallback (never run on the default v2 path)."""
    import textwrap

    src = inspect.getsource(ice.IcebergSnapshotStore._enable_dynamic_overwrite)
    assert "spark.sql.sources.partitionOverwriteMode" in src
    assert '"dynamic"' in src
    # and the failure path exists (asserted, not just set)
    assert "RuntimeError" in textwrap.dedent(src)
    # __init__ itself must NOT touch the conf except via the gated fallback
    init_src = inspect.getsource(ice.IcebergSnapshotStore.__init__)
    assert "conf.set" not in init_src
    assert "_enable_dynamic_overwrite" in init_src
    assert "if not writer_v2" in init_src


def test_default_write_path_is_writer_v2_overwrite_partitions():
    """The default per-round overwrite goes through DataFrameWriterV2's
    overwritePartitions() — dynamic overwrite semantics carried by the
    plan with no session-conf dependency; the append-only seen table uses
    v2 append. The SQL INSERT OVERWRITE form remains only as the
    writer_v2=False fallback."""
    src = inspect.getsource(ice.IcebergSnapshotStore.write)
    assert ".overwritePartitions()" in src
    assert ".append()" in src
    assert "if self.writer_v2" in src
    # v2 default in the constructor signature
    sig = inspect.signature(ice.IcebergSnapshotStore.__init__)
    assert sig.parameters["writer_v2"].default is True


def test_maintenance_procedures():
    assert ice.compact_sql(CAT, NS, "seen") == (
        "CALL ice.system.rewrite_data_files("
        "table => 'crawl.seen', strategy => 'binpack')"
    )
    assert "expire_snapshots" in ice.expire_snapshots_sql(CAT, NS, "seen", 10)
    assert "rollback_to_snapshot" in ice.rollback_sql(CAT, NS, "frontier", 9)


def test_api_parity_with_parquet_engine():
    """Every public method crawlspark.round calls on SnapshotStore exists on
    IcebergSnapshotStore with a compatible signature."""
    core = [
        "write", "read", "exists", "read_seen", "commit_round",
        "read_manifest", "last_complete_round", "last_compaction",
        "compact_seen", "read_all", "drop_rounds_after",
    ]
    for name in core:
        pq = inspect.signature(getattr(SnapshotStore, name))
        ib = inspect.signature(getattr(ice.IcebergSnapshotStore, name))
        assert list(pq.parameters) == list(ib.parameters), name


def test_fails_fast_without_catalog(spark):
    assert not iceberg_available(spark)
    with pytest.raises(RuntimeError, match="No Iceberg catalog"):
        ice.IcebergSnapshotStore(spark, CAT, NS)
