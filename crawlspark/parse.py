"""Link extraction from interleaved span arrays (SURVEY.md §3.10 U-6, §4.3).

Pure JVM built-ins on the hot path: ``posexplode`` exposes span order as
``pos`` (order is data — the pos↔offset correspondence is the span-sequence
invariant of BASELINE.json:15), higher-order ``filter`` prunes non-link
spans BEFORE the explode so the generator emits only useful rows, and
path-absolute / dotted-relative refs resolve with string built-ins against
the doc's base URL. Only refs that fail the fast patterns fall back to the
U-2 pandas UDF (general RFC-3986 join) — at fetch-spec distribution that is
~8% of refs (the dotted-relative slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .udfs import resolve_links

LINK_KINDS = ("link", "image", "video")


def extract_links(docs: DataFrame) -> DataFrame:
    """DOCUMENTS rows → (url AS base_url, kind, anchor_text, pos, target).

    Keeps only status-200 docs and spans carrying a media_ref.
    """
    pruned = docs.filter(F.col("status") == 200).select(
        F.col("url").alias("base_url"),
        F.filter(
            F.col("spans"),
            lambda s: s["kind"].isin(*LINK_KINDS) & s["media_ref"].isNotNull()
            & (s["media_ref"] != ""),
        ).alias("link_spans"),
    )
    exploded = pruned.select(
        "base_url", F.posexplode("link_spans").alias("pos", "s")
    ).select(
        "base_url",
        "pos",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("anchor_text"),
        F.col("s.media_ref").alias("ref"),
        F.col("s.offset").alias("offset"),
    )
    base_origin = F.regexp_extract(F.col("base_url"), r"^(https?://[^/]+)", 1)
    target = (
        F.when(
            F.col("ref").startswith("http://") | F.col("ref").startswith("https://"),
            F.col("ref"),
        )
        .when(F.col("ref").startswith("/"), F.concat(base_origin, F.col("ref")))
        .otherwise(resolve_links(F.col("base_url"), F.col("ref")))
    )
    return exploded.withColumn("url", target).filter(F.col("url").isNotNull())


def candidate_links(docs: DataFrame, parents: DataFrame) -> DataFrame:
    """Attach parent priority/depth (broadcast join on the small fetch batch)
    and derive child scheduling columns (SPEC.md §6)."""
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
        "url",
        (F.col("_p_depth") + 1).cast("int").alias("crawl_depth"),
        (
            F.col("_p_priority")
            + F.when(F.col("kind") == "link", F.lit(1)).otherwise(F.lit(2))
        ).cast("int").alias("priority"),
    )
