"""URL preparation pipeline: canon → hash → validity → robots (SURVEY.md
§3.2 F1–F5, §4.3).

Column-level contract: input needs a raw ``url`` column (plus any carried
columns); output adds ``url`` (canonicalized in place), ``host``,
``url_hash``, ``host_hash``, ``bucket`` and has validity+robots-disallowed
rows removed. Everything except canonicalization (U-1 pandas UDF) and the
robots longest-match (U-7 pandas UDF) is JVM built-ins, so Catalyst keeps
the relational segments in whole-stage codegen and the two Arrow hops are
isolated (SURVEY.md §4.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .config import CrawlConfig
from .udfs import canon_urls, robots_allowed


def canonicalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Replace `url_col` with its canonical form; drop rows that fail to
    canonicalize (non-http(s), empty, unparsable)."""
    return df.withColumn(url_col, canon_urls(F.col(url_col))).filter(
        F.col(url_col).isNotNull()
    )


def with_hashes(df: DataFrame, cfg: CrawlConfig, url_col: str = "url") -> DataFrame:
    """host / url_hash / host_hash / bucket via JVM built-ins only (F2/F3).

    `parse_url` host extraction matches urlnorm.host_of for canonical URLs
    (lowercased, userinfo-stripped) — asserted by tests/test_ingest.py.
    """
    return (
        df.withColumn("host", F.parse_url(F.col(url_col), F.lit("HOST")))
        .withColumn("url_hash", F.xxhash64(F.col(url_col)))
        .withColumn("host_hash", F.xxhash64(F.col("host")))
        .withColumn("bucket", F.pmod(F.col("url_hash"), F.lit(cfg.n_buckets)).cast("int"))
    )


def validity_filter(df: DataFrame, cfg: CrawlConfig, url_col: str = "url") -> DataFrame:
    """F4: http(s)-only, bounded length, bounded depth (when present)."""
    cond = (
        (F.col(url_col).startswith("http://") | F.col(url_col).startswith("https://"))
        & (F.length(url_col) <= cfg.max_url_len)
        & F.col("host").isNotNull()
    )
    if "crawl_depth" in df.columns:
        cond = cond & (F.col("crawl_depth") <= F.lit(cfg.max_depth))
    return df.filter(cond)


def robots_filter(df: DataFrame, robots_df: DataFrame, url_col: str = "url") -> DataFrame:
    """F5 via J2: broadcast-join per-host rules, keep allowed rows.

    The robots dim table is tiny (one row per host) — always broadcast,
    never left to autoBroadcastJoinThreshold stats (SURVEY.md §5).
    Hosts absent from the table are fully allowed.
    """
    rules = F.broadcast(
        robots_df.select(
            F.col("host").alias("_r_host"),
            "allow_prefixes",
            "disallow_prefixes",
        )
    )
    path = F.concat(
        F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit("/")),
        F.when(
            F.parse_url(F.col(url_col), F.lit("QUERY")).isNotNull(),
            F.concat(F.lit("?"), F.parse_url(F.col(url_col), F.lit("QUERY"))),
        ).otherwise(F.lit("")),
    )
    joined = df.join(rules, df["host"] == rules["_r_host"], "left")
    allowed = F.when(
        F.col("_r_host").isNull(), F.lit(True)
    ).otherwise(robots_allowed(path, F.col("allow_prefixes"), F.col("disallow_prefixes")))
    return joined.filter(allowed).drop("_r_host", "allow_prefixes", "disallow_prefixes")


def prepare_urls(
    df: DataFrame, cfg: CrawlConfig, robots_df: DataFrame | None, url_col: str = "url"
) -> DataFrame:
    out = canonicalize(df, url_col)
    out = with_hashes(out, cfg, url_col)
    out = validity_filter(out, cfg, url_col)
    if robots_df is not None:
        out = robots_filter(out, robots_df, url_col)
    return out


def dedup_candidates(df: DataFrame) -> DataFrame:
    """A2: in-round dedup by url_hash — deterministic winner (min url /
    min priority / min depth), never dropDuplicates (SURVEY.md §3.4 A2)."""
    return df.groupBy("url_hash").agg(
        F.min("url").alias("url"),
        F.min("priority").alias("priority"),
        F.min("crawl_depth").alias("crawl_depth"),
        F.min("bucket").alias("bucket"),
        F.min("host_hash").alias("host_hash"),
        F.min("host").alias("host"),
    )
