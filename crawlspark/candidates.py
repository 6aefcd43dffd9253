"""Fused candidate pipeline: one Arrow pass from exploded link spans to
scheduled candidate rows (SURVEY.md §3.2 F1-F5 + §3.10 U-1/U-2/U-3/U-7
fused; SPEC.md §6-9).

The naive composition — resolve UDF → canon UDF → JVM hashes → robots
broadcast join → robots UDF → bloom-probe UDF — crosses the JVM↔Python
Arrow boundary three times and plans two joins per round. Since
crawlspark.xxh64 is bit-exact with Spark's xxhash64 (tests/test_xxh64.py),
the whole per-URL pipeline can run in ONE mapInPandas pass:

    resolve → canonicalize → validity → host/url hashing → robots
    longest-match (rules dict broadcast) → bucket → Bloom probe
    (per-bucket blob payload broadcast)

This is exactly the shape of heroshi's per-URL processing in the manager
(one in-memory pass per reported link — recalled, SURVEY.md §0), expressed
as a single vectorized stage. The JVM side keeps what the JVM is best at:
span pruning + posexplode (order-preserving generator) and the broadcast
join attaching parent priority/depth; the downstream dedup groupBy and the
exact anti-join stay relational so Catalyst/AQE handle skew and sizing.

Scale notes:
- Bloom payload: probed as a CHAIN of broadcasts (one consolidated base +
  per-round deltas holding only changed buckets). Probing each link and
  OR-ing the flags never misses an inserted key and has <= the FP rate of
  the merged filter (a merged blob can set a key's k bits across two
  sources; separate probes can't), so correctness is unchanged — the exact
  anti-join decides anyway.
- robots rules: two modes. Dict-broadcast inside the fused pass (default;
  right up to ~10^6 rule hosts), or cfg.robots_relational — the Arrow pass
  emits (host, path) untested and a broadcast JOIN against the robots dim +
  vectorized U-7 UDF applies the filter relationally, so no driver-resident
  python dict exists at any scale. Digest-equality tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import bloom as bloom_mod
from . import urlnorm
from .config import CrawlConfig
from .parse import extract_links
from .robots import allowed_batch as robots_allowed_batch
from .xxh64 import hash_str

CANDIDATE_SCHEMA = (
    "url string, url_hash long, host string, host_hash long, priority int, "
    "crawl_depth int, bucket int, maybe_seen boolean"
)


def _bloom_chain(bloom_bcast) -> list | None:
    """Normalize None | single broadcast | list-of-broadcasts to a list."""
    if bloom_bcast is None:
        return None
    if isinstance(bloom_bcast, (list, tuple)):
        return list(bloom_bcast) or None
    return [bloom_bcast]


def _partial_dedup(res: pd.DataFrame, relational: bool) -> pd.DataFrame:
    """Map-side combine for the A2 dedup, run INSIDE the Arrow pass (guide
    §2.3 "aggregate before you shuffle"): the round-8 bucket keying places
    the explicit repartition BELOW the aggregate, so without this the
    exchange would carry every RAW link row (duplicate links included) —
    the round-7 url_hash-keyed aggregate combined map-side for free.
    Per-batch, per-url_hash partial mins compose exactly with the global
    aggregate (min/max are associative; every column is min'd
    independently there too). String mins compare UTF-8 BYTES so the
    partial order is identical to Spark's binary string collation (python
    str comparison is codepoint order, which diverges on non-ASCII).
    host/host_hash/bucket/path/maybe_seen are functions of the canonical
    url/url_hash, so their min/max is value-stable regardless."""
    if len(res) <= 1 or not res["url_hash"].duplicated().any():
        return res
    work = res.assign(
        _ub=res["url"].str.encode("utf-8"),
        _hb=res["host"].str.encode("utf-8"),
    )
    spec = {
        "_ub": ("_ub", "min"),
        "_hb": ("_hb", "min"),
        "host_hash": ("host_hash", "min"),
        "priority": ("priority", "min"),
        "crawl_depth": ("crawl_depth", "min"),
        "bucket": ("bucket", "min"),
        "maybe_seen": ("maybe_seen", "max"),
    }
    if relational:
        work = work.assign(_pb=res["path"].str.encode("utf-8"))
        spec["_pb"] = ("_pb", "min")
    agg = work.groupby("url_hash", as_index=False, sort=False).agg(**spec)
    out = pd.DataFrame(
        {
            "url": agg["_ub"].str.decode("utf-8"),
            "url_hash": agg["url_hash"].astype("int64"),
            "host": agg["_hb"].str.decode("utf-8"),
            "host_hash": agg["host_hash"].astype("int64"),
            "priority": agg["priority"].astype("int32"),
            "crawl_depth": agg["crawl_depth"].astype("int32"),
            "bucket": agg["bucket"].astype("int32"),
        }
    )
    if relational:
        out["path"] = agg["_pb"].str.decode("utf-8")
    out["maybe_seen"] = agg["maybe_seen"].astype(bool)
    return out


def candidate_rows(
    docs: DataFrame,
    cfg: CrawlConfig,
    robots_bcast,
    bloom_bcast,
    robots_df: DataFrame | None = None,
    relational: bool | None = None,
) -> DataFrame:
    """DOCUMENTS rows → deduped candidate rows with a `maybe_seen` Bloom
    flag (A2 done; J1's exact tier still pending downstream).

    `bloom_bcast` may be a single broadcast or the sliced chain (base +
    deltas). With cfg.robots_relational the robots filter moves out of the
    Arrow pass into a broadcast join + vectorized UDF (pass robots_df).

    No join needed for parent metadata: the documents snapshot carries
    parent_priority / parent_depth through the fetch (schemas.DOCUMENTS),
    so the parse path is scan → prune+explode → one Arrow pass → dedup."""
    joined = extract_links(docs, carry=("parent_priority", "parent_depth")).select(
        "base_url", "kind", "ref", "parent_priority", "parent_depth"
    )

    max_depth = cfg.max_depth
    max_len = cfg.max_url_len
    n_buckets = cfg.n_buckets
    if relational is None:
        relational = cfg.robots_relational
    relational = relational and robots_df is not None
    blooms = _bloom_chain(bloom_bcast)

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .xxh64 import hash_str_np

        rules = (
            robots_bcast.value if (robots_bcast is not None and not relational) else {}
        )
        payloads = [b.value for b in blooms] if blooms is not None else None

        for pdf in batches:
            n = len(pdf)
            # a redirect (location span) is the SAME resource: its target
            # inherits the parent's depth and priority unchanged, while
            # real outlinks step depth by 1 (oracle/simulator.py mirrors)
            kinds_all = pdf["kind"].to_numpy(object)
            is_loc = np.asarray(kinds_all, dtype=object) == "location"
            depth = pdf["parent_depth"].to_numpy().astype(np.int64) + np.where(
                is_loc, 0, 1
            )
            alive = depth <= max_depth

            # resolve: vectorized concat fast paths (absolute, protocol-
            # relative, path-absolute, sibling/dotted) — canonically equal
            # to per-row urljoin, which only the odd remainder pays
            urls = urlnorm.resolve_batch(
                pdf["base_url"].astype(object), pdf["ref"].astype(object), alive
            )

            # canonicalize: three tiers, all inside urlnorm.canon_batch —
            # the ~90% provably-canonical fast capture, the vectorized
            # case/port/dot-segment assist (catches every dotted relative
            # link), and the scalar canon_url only for the odd remainder
            urls, hosts, paths = urlnorm.canon_batch(urls, alive)

            lens = np.fromiter(
                (len(u) if u is not None else 0 for u in urls), np.int64, n
            )
            keep = (
                alive
                & (urls != None)  # noqa: E711
                & (hosts != None)  # noqa: E711
                & (lens <= max_len)
            )

            # robots (dict mode): only rule-bearing hosts pay the matcher,
            # batched per distinct host (vectorized prefix matching)
            if not relational and rules:
                kidx = np.nonzero(keep)[0]
                if len(kidx):
                    codes, uniq = pd.factorize(
                        pd.Series(hosts[kidx], dtype="object")
                    )
                    for ci, h in enumerate(uniq):
                        rule = rules.get(h)
                        if rule is None:
                            continue
                        sel = kidx[codes == ci]
                        ok = robots_allowed_batch(paths[sel], rule[0], rule[1])
                        keep[sel[~ok]] = False

            idx = np.nonzero(keep)[0]
            k_urls = urls[idx].tolist()
            k_hosts = hosts[idx]
            uh = hash_str_np(k_urls)
            # hosts repeat heavily: hash each distinct host once
            codes, uniq = pd.factorize(pd.Series(k_hosts, dtype="object"))
            hh = (
                hash_str_np(uniq.tolist())[codes]
                if len(uniq)
                else np.empty(0, np.int64)
            )
            kinds = np.asarray(kinds_all[idx], dtype=object)
            prio = pdf["parent_priority"].to_numpy().astype(np.int64)[idx] + np.where(
                kinds == "location", 0, np.where(kinds == "link", 1, 2)
            )
            res = pd.DataFrame(
                {
                    "url": pd.Series(k_urls, dtype="object"),
                    "url_hash": pd.Series(uh, dtype="int64"),
                    "host": pd.Series(k_hosts, dtype="object"),
                    "host_hash": pd.Series(hh, dtype="int64"),
                    "priority": pd.Series(prio.astype(np.int32), dtype="int32"),
                    "crawl_depth": pd.Series(depth[idx].astype(np.int32), dtype="int32"),
                    "bucket": pd.Series((uh % n_buckets).astype(np.int32), dtype="int32"),
                }
            )
            if relational:
                res["path"] = pd.Series(paths[idx], dtype="object")
            if payloads is None:
                res["maybe_seen"] = True  # no filter ⇒ exact join decides
            elif len(res) == 0:
                res["maybe_seen"] = pd.Series([], dtype="bool")
            else:
                res["maybe_seen"] = bloom_mod.probe_chain(
                    payloads, res["bucket"].to_numpy(), res["url_hash"].to_numpy()
                )
            yield _partial_dedup(res, relational)

    schema = CANDIDATE_SCHEMA + (", path string" if relational else "")
    cands = joined.mapInPandas(process, schema)
    if relational:
        from .udfs import robots_allowed as robots_allowed_udf

        rules_df = robots_df.select(
            "host", "allow_prefixes", "disallow_prefixes"
        ).filter(
            (F.size("allow_prefixes") > 0) | (F.size("disallow_prefixes") > 0)
        )
        cands = (
            cands.join(F.broadcast(rules_df), "host", "left")
            .filter(
                F.col("allow_prefixes").isNull()
                | robots_allowed_udf(
                    F.col("path"),
                    F.col("allow_prefixes"),
                    F.col("disallow_prefixes"),
                )
            )
            .drop("path", "allow_prefixes", "disallow_prefixes")
        )
    # A2 dedup — deterministic winner; maybe_seen is functionally dependent
    # on url_hash (same canonical url) so any aggregate works: use max.
    # Round 8: keyed (bucket, url_hash) after ONE explicit bucket
    # repartition — bucket = url_hash mod P, so the groups are identical
    # to the old url_hash keying, but hash(bucket) partitioning now
    # satisfies the clustering requirement of everything downstream: this
    # dedup, the (bucket, url_hash) exact anti-join (split_new), the
    # relational bloom cogroup on bucket, and the bucket-clustered
    # seen_delta write. Candidates cross the wire once instead of once
    # per keying (guide §2.4 "two operations keyed the same way can share
    # one exchange"; plan-asserted in tests/test_seen_integration.py).
    return (
        cands.repartition(F.col("bucket"))
        .groupBy("bucket", "url_hash")
        .agg(
            F.min("url").alias("url"),
            F.min("priority").alias("priority"),
            F.min("crawl_depth").alias("crawl_depth"),
            F.min("host_hash").alias("host_hash"),
            F.min("host").alias("host"),
            F.max("maybe_seen").alias("maybe_seen"),
        )
        .select(
            "url_hash", "url", "priority", "crawl_depth", "bucket",
            "host_hash", "host", "maybe_seen",
        )
    )


def split_new(
    cands: DataFrame, seen: DataFrame | None, n_buckets: int | None = None
) -> DataFrame:
    """J1 exact tier on the pre-flagged candidates: definitely-new rows
    bypass the join; maybe-seen rows anti-join the exact seen table.

    With ``n_buckets`` the anti-join keys on (bucket, url_hash) — the
    seen side's bucket is DERIVED from url_hash mod n_buckets (equal
    url_hash ⇒ equal bucket by construction, immune to stored-bucket
    drift), so the candidate side's existing hash(bucket) partitioning
    (candidate_rows round-8 keying) satisfies the join's clustering
    requirement and only the seen side shuffles. Without it (legacy
    callers/tests) the join keys on url_hash alone — identical rows
    either way."""
    if seen is None:
        return cands.drop("maybe_seen")
    definitely = cands.filter(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = cands.filter(F.col("maybe_seen")).drop("maybe_seen")
    if n_buckets is None:
        survived = maybe.hint("shuffle_hash").join(
            seen.select("url_hash"), "url_hash", "left_anti"
        )
    else:
        seen_keys = seen.select(
            F.pmod(F.col("url_hash"), F.lit(int(n_buckets)))
            .cast("int")
            .alias("bucket"),
            "url_hash",
        )
        # hint rides the SEEN side: LeftAnti can only build right, and a
        # left-side hint names an impossible build side here (the planner
        # then falls back to sort-merge — observed, Spark 4.1). The
        # candidate side's hash(bucket) partitioning is accepted for the
        # (bucket, url_hash) clustering only when
        # spark.sql.requireAllClusterKeysForCoPartition=false (set by
        # init_crawl/resume — see the note there); the seen side then
        # co-partitions by bucket and ONLY it shuffles.
        survived = maybe.join(
            seen_keys.hint("shuffle_hash"), ["bucket", "url_hash"], "left_anti"
        )
    return definitely.unionByName(survived)


def robots_rules_map(robots_df) -> dict:
    """{host: (allow_prefixes, disallow_prefixes)} for python-side broadcast
    (io-worker's in-memory robots cache, SURVEY.md §3.1 S7).

    Hosts with NO prefixes are pruned — absent host ⇒ fully allowed, so the
    broadcast only carries rule-bearing hosts (~1/3 of the fixture universe;
    at web scale this is the same reason robots caches only store hosts
    whose robots.txt said anything)."""
    out = {}
    for r in robots_df.collect():
        allow = list(r["allow_prefixes"] or [])
        disallow = list(r["disallow_prefixes"] or [])
        if allow or disallow:
            out[r["host"]] = (allow, disallow)
    return out
