"""Link extraction from interleaved span arrays (SURVEY.md §3.10 U-6, §4.3).

JVM built-ins do the heavy row-generation: higher-order ``filter`` prunes
non-link spans BEFORE the explode, ``posexplode`` exposes span order as
``pos`` (order is data — the pos↔offset correspondence is the
span-sequence invariant of BASELINE.json:15). Resolution+canonicalization
of the targets is ONE fused Arrow-vectorized UDF (``resolve_canon``) —
chaining separate resolve and canon UDF nodes measurably thrashes the
Python runner pipeline, and every target needs canonicalization anyway, so
the fast-path split buys nothing (profiled at the sf0.1 tier: fused UDF +
candidate caching took the parse stage from ~20s to ~3s).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from . import urlnorm

LINK_KINDS = ("link", "image", "video")
# `location` rides the same path: a 301 doc carries exactly one location
# span (fetch_spec.simulate_fetch) whose target must enter the candidate
# pipeline — with UNCHANGED priority/depth (a redirect is the same
# resource, not an outlink; candidates.py and oracle/simulator.py apply
# the same rule). 200 docs never carry location spans, so one combined
# kind filter is faithful without a per-status branch.
FOLLOW_KINDS = LINK_KINDS + ("location",)


@pandas_udf(StringType())
def resolve_canon(
    it: Iterator[Tuple[pd.Series, pd.Series]]
) -> Iterator[pd.Series]:
    """U-2∘U-1 fused: canonical absolute target of (base, possibly-relative
    ref); null when unusable."""

    def one(b, r):
        return urlnorm.canon_url(urlnorm.resolve_url(b, r))

    for base, ref in it:
        yield pd.Series([one(b, r) for b, r in zip(base, ref)], dtype="object")


def extract_links(docs: DataFrame, carry: tuple[str, ...] = ()) -> DataFrame:
    """DOCUMENTS rows → (base_url, [carry...], pos, kind, anchor_text, ref,
    offset): one row per link-bearing span of every status-200 doc plus the
    location span of every 301 doc, span order preserved. Targets not yet
    resolved (pure JVM plan)."""
    pruned = docs.filter(F.col("status").isin(200, 301)).select(
        F.col("url").alias("base_url"),
        *carry,
        F.filter(
            F.col("spans"),
            lambda s: s["kind"].isin(*FOLLOW_KINDS) & s["media_ref"].isNotNull()
            & (s["media_ref"] != ""),
        ).alias("link_spans"),
    )
    return pruned.select(
        "base_url", *carry, F.posexplode("link_spans").alias("pos", "s")
    ).select(
        "base_url",
        *carry,
        "pos",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("anchor_text"),
        F.col("s.media_ref").alias("ref"),
        F.col("s.offset").alias("offset"),
    )


def candidate_links(docs: DataFrame, parents: DataFrame) -> DataFrame:
    """Canonical candidate URLs with child scheduling columns (SPEC.md §6):
    explode → fused resolve+canon → attach parent priority/depth via a
    broadcast join on the (small) fetch batch."""
    p = F.broadcast(
        parents.select(
            F.col("url").alias("_p_url"),
            F.col("priority").alias("_p_priority"),
            F.col("crawl_depth").alias("_p_depth"),
        )
    )
    links = extract_links(docs)
    joined = links.join(p, links["base_url"] == p["_p_url"], "inner")
    return joined.select(
        resolve_canon(F.col("base_url"), F.col("ref")).alias("url"),
        (
            F.col("_p_depth")
            + F.when(F.col("kind") == "location", F.lit(0)).otherwise(F.lit(1))
        ).cast("int").alias("crawl_depth"),
        (
            F.col("_p_priority")
            + F.when(F.col("kind") == "location", F.lit(0))
            .when(F.col("kind") == "link", F.lit(1))
            .otherwise(F.lit(2))
        ).cast("int").alias("priority"),
    ).filter(F.col("url").isNotNull())


def content_record(spans) -> F.Column:
    """Canonical serialization of a span array: per-span
    `kind\\x1etext\\x1eref\\x1eoffset` records joined by \\x1f — the string
    both content digests hash (and the DuckDB oracle reproduces with
    list_transform/chr)."""
    return F.concat_ws(
        "\x1f",
        F.transform(
            spans,
            lambda s: F.concat_ws(
                "\x1e",
                s["kind"],
                F.coalesce(s["text"], F.lit("")),
                F.coalesce(s["media_ref"], F.lit("")),
                s["offset"].cast("string"),
            ),
        ),
    )


def content_fingerprint(spans) -> F.Column:
    """xxh64 content digest of a span array, pure JVM codegen (no UDF).
    Bit-equal to the oracle's fetch_spec.content_fingerprint_py — the
    content-seen dedup key (Heritrix-style content digest), NOT a
    similarity hash: byte-identical span arrays only."""
    return F.xxhash64(content_record(spans))


def redirect_edges(docs: DataFrame) -> DataFrame:
    """Redirect observations from 301 docs: (src, dst) canonical URL pairs
    — the input edge table of graphops.redirect_resolve, turning a crawl's
    accumulated documents into a chain-resolved alias map. Pure JVM prune +
    one fused resolve+canon UDF over only the 301 rows."""
    links = extract_links(docs).filter(F.col("kind") == "location")
    return links.select(
        F.col("base_url").alias("src"),
        resolve_canon(F.col("base_url"), F.col("ref")).alias("dst"),
    ).filter(F.col("dst").isNotNull())
