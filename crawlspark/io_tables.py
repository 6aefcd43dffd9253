"""Table IO seam — Iceberg semantics, parquet-snapshot engine (SURVEY.md §6.4).

No Iceberg runtime jar ships in this sandbox (verified: /opt/spark/jars has
none, no network to fetch one), so exact-resume state lives in a
directory-per-round parquet layout with a JSON manifest:

    <ckpt>/round=<r>/frontier/          full frontier AFTER round r (delta
                                        engine: only at BASE rounds)
    <ckpt>/round=<r>/frontier_delta_rows/ delta engine: ONE op-tagged dir
                                        per round (op='add' rows discovered,
                                        op='del' url_hash fetched); the older
                                        split additions/removals layout is
                                        still readable
    <ckpt>/round=<r>/frontier_deferrals/delta × adaptive: sparse stored
                                        exceptions (rows whose deferral
                                        diverged from the derivable
                                        constant-delay schedule)
    <ckpt>/round=<r>/seen_delta/        seen rows ADDED in round r (O(batch) IO)
    <ckpt>/round=<r>/seen_full/         compacted full seen set (optional;
                                        bounds delta-union fan-in — the
                                        Iceberg-compaction analog)
    <ckpt>/round=<r>/bloom/             per-bucket blob rows after round r
                                        (relational bloom mode: only at
                                        BASE rounds — init + compactions)
    <ckpt>/round=<r>/bloom_delta/       relational bloom mode: partial
                                        blobs of round r's new keys
    <ckpt>/round=<r>/crawl_order/       ordered fetch batch of round r
    <ckpt>/round=<r>/documents/         docs fetched in round r
    <ckpt>/round=<r>/lineage/           per-partition metrics of round r
    <ckpt>/_manifest.json               {"rounds": [...], "config": {...}}

Reading the seen set at round r = parquet glob over seen_delta of rounds
0..r — append-only, so per-round write cost is O(new URLs), not O(seen).
The frontier advances as an O(batch) delta by DEFAULT (removals+additions
in one op-tagged dir; deferrals derived, adaptive exceptions stored
sparsely); the stored engine (frontier_delta=False) rewrites it whole per
round. The Iceberg engine variant expresses the same update as a
row-level MERGE (delete selected rows, update deferred rows, append new
rows — O(batch) row churn, with Iceberg compacting underneath). The seam
keeps both engines API-compatible:
swap `SnapshotStore` for an Iceberg-backed implementation with the same
five methods and `crawlspark.round` does not change.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths --------------------------------------------------------------
    def _dir(self, round_: int, table: str) -> str:
        return os.path.join(self.root, f"round={round_}", table)

    # -- manifest -----------------------------------------------------------
    def _manifest_path(self) -> str:
        return os.path.join(self.root, "_manifest.json")

    def read_manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"rounds": []}
        with open(p) as f:
            return json.load(f)

    def commit_round(self, round_: int, extra: dict | None = None) -> None:
        """Atomically record round `round_` as complete (write-then-rename)."""
        m = self.read_manifest()
        if round_ not in m["rounds"]:
            m["rounds"].append(round_)
            m["rounds"].sort()
        if extra:
            m.setdefault("round_info", {})[str(round_)] = extra
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())

    def last_complete_round(self) -> int | None:
        rounds = self.read_manifest()["rounds"]
        return max(rounds) if rounds else None

    # -- IO -----------------------------------------------------------------
    def write(self, df: DataFrame, round_: int, table: str) -> None:
        df.write.mode("overwrite").parquet(self._dir(round_, table))

    def read(self, round_: int, table: str) -> DataFrame:
        return self.spark.read.parquet(self._dir(round_, table))

    def exists(self, round_: int, table: str) -> bool:
        return os.path.exists(os.path.join(self._dir(round_, table), "_SUCCESS"))

    def read_seen(self, upto_round: int) -> DataFrame | None:
        """The seen set at round upto_round: latest compacted snapshot ≤
        upto_round (if any) + the deltas after it. Append-only, so this is
        exact; compaction just bounds the number of unioned directories
        (the parquet-engine analog of Iceberg snapshot compaction)."""
        base = None
        start = 0
        c = self.last_compaction(upto_round)
        if c is not None:
            base = self.spark.read.parquet(self._dir(c, "seen_full"))
            start = c + 1
        dirs = [
            self._dir(r, "seen_delta")
            for r in range(start, upto_round + 1)
            if self.exists(r, "seen_delta")
        ]
        if not dirs:
            return base
        deltas = self.spark.read.parquet(*dirs)
        return deltas if base is None else base.unionByName(deltas)

    def last_compaction(self, upto_round: int) -> int | None:
        cs = [c for c in self.read_manifest().get("compactions", []) if c <= upto_round]
        return max(cs) if cs else None

    def compact_seen(self, upto_round: int) -> None:
        """Materialize the full seen set at upto_round into one
        bucket-clustered snapshot and record it in the manifest."""
        from pyspark.sql import functions as F

        seen = self.read_seen(upto_round)
        if seen is None:
            return
        seen.repartition(F.col("bucket")).sortWithinPartitions("url_hash").write.mode(
            "overwrite"
        ).parquet(self._dir(upto_round, "seen_full"))
        m = self.read_manifest()
        m.setdefault("compactions", [])
        if upto_round not in m["compactions"]:
            m["compactions"].append(upto_round)
            m["compactions"].sort()
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())

    # -- delta frontier engine (cfg.frontier_delta) -------------------------
    # Layout: full `frontier` directories exist only at BASE rounds (init +
    # every compact_frontier_every); other rounds write ONE op-tagged
    # `frontier_delta_rows` dir (op='del' selected url_hashes, op='add'
    # new FRONTIER rows; the legacy split layout remains readable).
    # A url_hash is added at most once and removed at most once, and the
    # removal always follows the addition (seen-set guarantee), so
    #   frontier(r) = (base(b) ∪ additions(b+1..r)) ∖ removals(b+1..r)
    # holds regardless of per-round ordering.

    def frontier_bases(self) -> list[int]:
        return self.read_manifest().get("frontier_bases", [])

    def record_frontier_base(self, round_: int) -> None:
        m = self.read_manifest()
        m.setdefault("frontier_bases", [])
        if round_ not in m["frontier_bases"]:
            m["frontier_bases"].append(round_)
            m["frontier_bases"].sort()
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())

    def write_frontier_delta(self, additions: DataFrame, removal_hashes: DataFrame,
                             round_: int) -> None:
        """ONE combined write per round: addition rows tagged op='add' and
        removal hashes tagged op='del' (other columns null) land in a
        single `frontier_delta_rows` dir — one Spark job instead of two,
        and the chain read opens r dirs instead of 2r."""
        from pyspark.sql import functions as F

        delta = additions.withColumn("op", F.lit("add")).unionByName(
            removal_hashes.select("url_hash").withColumn("op", F.lit("del")),
            allowMissingColumns=True,
        )
        self.write(delta, round_, "frontier_delta_rows")

    def read_frontier(self, round_: int) -> DataFrame:
        """The frontier AFTER `round_` under the delta engine (raw nb₀
        values — eligibility is derived by the scheduler). Reads the
        combined `frontier_delta_rows` layout; rounds written by older
        code with split `frontier_additions`/`frontier_removals` dirs are
        still honored (mixed chains resume cleanly)."""
        bases = [b for b in self.frontier_bases() if b <= round_]
        if not bases:  # plain engine (or base round itself)
            return self.read(round_, "frontier")
        b = max(bases)
        out = self.read(b, "frontier")
        combined, legacy_adds, legacy_rems = [], [], []
        for r in range(b + 1, round_ + 1):
            if self.exists(r, "frontier_delta_rows"):
                combined.append(self._dir(r, "frontier_delta_rows"))
            else:
                if self.exists(r, "frontier_additions"):
                    legacy_adds.append(self._dir(r, "frontier_additions"))
                if self.exists(r, "frontier_removals"):
                    legacy_rems.append(self._dir(r, "frontier_removals"))
        from pyspark.sql import functions as F

        adds_df = None
        rems_df = None
        if combined:
            cdf = self.spark.read.parquet(*combined)
            adds_df = cdf.filter(F.col("op") == "add").drop("op")
            rems_df = cdf.filter(F.col("op") == "del").select("url_hash")
        if legacy_adds:
            la = self.spark.read.parquet(*legacy_adds)
            adds_df = la if adds_df is None else adds_df.unionByName(la)
        if legacy_rems:
            lr = self.spark.read.parquet(*legacy_rems).select("url_hash")
            rems_df = lr if rems_df is None else rems_df.unionByName(lr)
        if adds_df is not None:
            out = out.unionByName(adds_df)
        if rems_df is not None:
            out = out.join(rems_df, "url_hash", "left_anti")
        return out

    def read_deferrals(self, upto_round: int) -> DataFrame | None:
        """Latest stored deferral per url_hash from rounds after the last
        frontier base (delta engine × adaptive politeness): rows whose
        deferral diverged from the derivable constant-delay schedule.
        Values strictly increase per url_hash (a row can only be re-deferred
        at its own offer round), so max() IS the latest."""
        from pyspark.sql import functions as F

        bases = [b for b in self.frontier_bases() if b <= upto_round]
        start = (max(bases) + 1) if bases else 0
        dirs = [
            self._dir(t, "frontier_deferrals")
            for t in range(start, upto_round + 1)
            if self.exists(t, "frontier_deferrals")
        ]
        if not dirs:
            return None
        return (
            self.spark.read.parquet(*dirs)
            .groupBy("url_hash")
            .agg(F.max("not_before_round").alias("_nb_stored"))
        )

    # -- relational Bloom state (cfg.bloom_mode='relational') ----------------
    # Layout mirrors the frontier deltas: full `bloom` base rows exist only
    # at BASE rounds (init + every compaction); other rounds append a
    # `bloom_delta` of per-bucket partial blobs holding ONLY that round's
    # new keys. The probe side reads base ∪ deltas as a chain (seen.py
    # probe_relational) — no driver registry, no broadcast payload.

    def bloom_bases(self) -> list[int]:
        return self.read_manifest().get("bloom_bases", [])

    def record_bloom_base(self, round_: int) -> None:
        m = self.read_manifest()
        m.setdefault("bloom_bases", [])
        if round_ not in m["bloom_bases"]:
            m["bloom_bases"].append(round_)
            m["bloom_bases"].sort()
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())

    def read_bloom_chain(self, round_: int) -> DataFrame | None:
        """Bloom rows as of `round_`: latest base ≤ round_ plus the deltas
        after it. Columns (bucket, blob, m_bits, k_hashes, n_items,
        capacity, is_base); delta rows carry capacity NULL."""
        from pyspark.sql import functions as F

        bases = [b for b in self.bloom_bases() if b <= round_]
        out = None
        start = 0
        if bases:
            b = max(bases)
            out = self.read(b, "bloom").withColumn("is_base", F.lit(True))
            start = b + 1
        dirs = [
            self._dir(r, "bloom_delta")
            for r in range(start, round_ + 1)
            if self.exists(r, "bloom_delta")
        ]
        if dirs:
            deltas = (
                self.spark.read.parquet(*dirs)
                .withColumn("capacity", F.lit(None).cast("int"))
                .withColumn("is_base", F.lit(False))
            )
            out = deltas if out is None else out.unionByName(deltas)
        return out

    # -- delta recrawl_state engine (cfg.recrawl_delta) -----------------------
    # Layout mirrors the frontier deltas, but the update is an UPSERT (rows
    # are touched, never deleted), so the chain resolves merge-on-read:
    # full `recrawl_state` dirs exist at BASE rounds (first write + every
    # compact_recrawl_every); other rounds write a `recrawl_state_delta` of
    # ONLY the rows the round changed (fetched + newly tracked + due-latched),
    # stamped with a `_rsv` round version. Reading at round r = base rows
    # (version = base round) ∪ delta rows (b, r], latest version per
    # url_hash wins — the Iceberg MERGE-INTO read shape, with compaction
    # bounding chain length exactly like compact_seen/frontier bases.

    def recrawl_bases(self) -> list[int]:
        return self.read_manifest().get("recrawl_bases", [])

    def record_recrawl_base(self, round_: int) -> None:
        m = self.read_manifest()
        m.setdefault("recrawl_bases", [])
        if round_ not in m["recrawl_bases"]:
            m["recrawl_bases"].append(round_)
            m["recrawl_bases"].sort()
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())

    def read_recrawl(self, upto_round: int) -> DataFrame | None:
        """The recrawl_state table as of `upto_round`, engine-agnostic:
        latest recorded base ≤ upto_round plus the delta chain after it,
        resolved latest-version-per-url_hash (one keyed window — at most
        one row per (url_hash, round) by construction, so deterministic).
        Legacy / pure-stored checkpoints (full dir, no recorded base)
        read the full dir directly."""
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        bases = [b for b in self.recrawl_bases() if b <= upto_round]
        if not bases:
            if self.exists(upto_round, "recrawl_state"):
                return self.read(upto_round, "recrawl_state")
            return None
        b = max(bases)
        dirs = [
            self._dir(t, "recrawl_state_delta")
            for t in range(b + 1, upto_round + 1)
            if self.exists(t, "recrawl_state_delta")
        ]
        if not dirs:  # stored rounds / fresh base: no resolve shuffle
            return self.read(b, "recrawl_state")
        out = self.read(b, "recrawl_state").withColumn(
            "_rsv", F.lit(int(b))
        ).unionByName(self.spark.read.parquet(*dirs))
        w = Window.partitionBy("url_hash").orderBy(F.col("_rsv").desc())
        return (
            out.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_rsv")
        )

    def read_all(self, table: str, upto_round: int) -> DataFrame | None:
        dirs = [
            self._dir(r, table) for r in range(upto_round + 1) if self.exists(r, table)
        ]
        if not dirs:
            return None
        return self.spark.read.parquet(*dirs)

    def vacuum(self, upto_round: int | None = None) -> dict:
        """Expire superseded STATE directories (the parquet-store analog of
        Iceberg's expire_snapshots): everything resume/continuation reads
        survives, everything a later base/snapshot supersedes is deleted.
        Output tables (documents, crawl_order, lineage, metrics) and the
        tiny unbounded-history chains (content_seen, host_counts) are never
        touched. Trades time travel (read_seen at pre-vacuum rounds) for
        space, exactly like snapshot expiry.

        Drop rules, each anchored on a manifest-recorded supersession:
        - seen_delta at r ≤ last compaction c (seen_full at c supersedes);
          older seen_full snapshots below c likewise;
        - frontier-family dirs below the last frontier base (the base
          folds the chain); with NO recorded base (pure stored engine),
          full `frontier` dirs below the last committed round (resume
          reads only the last);
        - bloom-family dirs below the last bloom base (relational mode);
          in broadcast mode `bloom` snapshots below the last round;
        - retry_queue below the last round (whole-rewrite per round).
        """
        m = self.read_manifest()
        last = max(m.get("rounds", [0]) or [0])
        upto = last if upto_round is None else min(upto_round, last)
        removed: list[str] = []

        def _drop(r: int, table: str) -> None:
            d = self._dir(r, table)
            if os.path.exists(d):
                shutil.rmtree(d, ignore_errors=True)
                removed.append(f"round={r}/{table}")

        c = self.last_compaction(upto)
        if c is not None:
            for r in range(0, c + 1):
                _drop(r, "seen_delta")
                if r < c:
                    _drop(r, "seen_full")
        fb = [b for b in self.frontier_bases() if b <= upto]
        if fb:
            b = max(fb)
            for r in range(0, b):
                for t in (
                    "frontier",
                    "frontier_delta_rows",
                    "frontier_additions",
                    "frontier_removals",
                    "frontier_deferrals",
                ):
                    _drop(r, t)
        else:
            for r in range(0, upto):
                _drop(r, "frontier")
        bb = [b for b in self.bloom_bases() if b <= upto]
        if bb:
            for r in range(0, max(bb)):
                _drop(r, "bloom")
                _drop(r, "bloom_delta")
        else:
            for r in range(0, upto):
                _drop(r, "bloom")
        rb = [b for b in self.recrawl_bases() if b <= upto]
        if rb:
            # the latest base folds the chain before it
            for r in range(0, max(rb)):
                _drop(r, "recrawl_state")
                _drop(r, "recrawl_state_delta")
        else:
            # pure stored engine: resume reads only the last full state
            for r in range(0, upto):
                _drop(r, "recrawl_state")
        for r in range(0, upto):
            _drop(r, "retry_queue")
            _drop(r, "host_state")
        m = self.read_manifest()
        m["vacuumed_upto"] = upto
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path())
        return {"upto": upto, "removed": removed}

    def drop_rounds_after(self, round_: int) -> None:
        """Used by resume tests to simulate a crash after `round_`."""
        m = self.read_manifest()
        for r in [r for r in m["rounds"] if r > round_]:
            shutil.rmtree(os.path.join(self.root, f"round={r}"), ignore_errors=True)
        m["rounds"] = [r for r in m["rounds"] if r <= round_]
        if "round_info" in m:
            m["round_info"] = {
                k: v for k, v in m["round_info"].items() if int(k) <= round_
            }
        if "compactions" in m:
            m["compactions"] = [c for c in m["compactions"] if c <= round_]
        if "frontier_bases" in m:
            m["frontier_bases"] = [b for b in m["frontier_bases"] if b <= round_]
        if "bloom_bases" in m:
            m["bloom_bases"] = [b for b in m["bloom_bases"] if b <= round_]
        if "recrawl_bases" in m:
            m["recrawl_bases"] = [b for b in m["recrawl_bases"] if b <= round_]
        with open(self._manifest_path(), "w") as f:
            json.dump(m, f, indent=1)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is usable (never in this sandbox)."""
    try:
        spark.sql("SELECT 1").collect()
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False
