"""spark-submit CLI for the crawl engine (SURVEY.md §8.M7).

Packaging:  cd bench && python scaling.py  builds crawlspark.zip; or
            zip -r crawlspark.zip crawlspark oracle

Usage:
  spark-submit --py-files crawlspark.zip -m crawlspark.cli  (or cli.py path)
      init   --ckpt DIR --seeds FILE [--hosts N]
      run    --ckpt DIR --rounds R [--hosts N]
      resume --ckpt DIR --rounds R [--hosts N]
      status --ckpt DIR

Seeds file: one URL per line (heroshi's io-worker job-per-line convention).
All scheduling is round-slot based; reruns of the same seed list and config
are bit-identical (SPEC.md).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark():
    from pyspark.sql import SparkSession

    return SparkSession.builder.appName("crawlspark").getOrCreate()


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="crawlspark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    for name in ("init", "run", "resume", "status", "vacuum"):
        p = sub.add_parser(name)
        p.add_argument("--ckpt", required=True)
        if name == "init":
            p.add_argument("--seeds", required=True)
            p.add_argument(
                "--sitemaps", default=None,
                help="optional (host, xml) sitemap parquet; parsed <loc> "
                "entries join the seed set at quantized sitemap priority",
            )
        if name in ("run", "resume"):
            p.add_argument("--rounds", type=int, required=True)
        p.add_argument("--hosts", type=int, default=50)
        p.add_argument("--max-per-host", type=int, default=4)
        p.add_argument("--capacity", type=int, default=0, help="0 = uncapped")
        p.add_argument(
            "--adaptive", action="store_true",
            help="adaptive per-host politeness (backoff from observed errors)",
        )
        p.add_argument(
            "--url-quality-filter", action="store_true",
            help="pre-fetch URL policy filter (blocklist/media extensions)",
        )
        p.add_argument(
            "--content-dedup", action="store_true",
            help="content-seen dedup: duplicate-content docs never expand "
            "the frontier",
        )
        p.add_argument(
            "--fetch-retries", type=int, default=0,
            help="retry transient (5xx) failures up to N attempts with "
            "exponential backoff (0 = off)",
        )
        p.add_argument(
            "--host-quota", type=int, default=0,
            help="per-host page quota (frontier admission cap; 0 = off)",
        )
        p.add_argument(
            "--recrawl-every", type=int, default=0,
            help="closed-loop recrawl cadence in rounds: re-enqueue fetched "
            "URLs past their host's observed-changefreq interval (0 = off)",
        )
        p.add_argument(
            "--recrawl-interval", type=int, default=4,
            help="base recrawl interval in rounds (scaled by the observed "
            "change class; only with --recrawl-every)",
        )
        p.add_argument(
            "--conditional-fetch", action="store_true",
            help="revalidate refetches against the stored content "
            "fingerprint: unchanged content is recorded as 304 with no "
            "span payload (requires --recrawl-every)",
        )
        p.add_argument(
            "--ip-groups", type=int, default=0,
            help="per-IP politeness: hosts hash into N IP groups and each "
            "group keeps at most --ip-budget selected rows per round "
            "(0 = off)",
        )
        p.add_argument(
            "--ip-budget", type=int, default=4,
            help="per-IP-group row budget per round (with --ip-groups)",
        )
    args = ap.parse_args(argv)

    from crawlspark import round as rnd
    from crawlspark.config import CrawlConfig
    from crawlspark.fetch_spec import FetchSpec
    from crawlspark.io_tables import SnapshotStore

    spark = _spark()
    spark.sparkContext.setLogLevel("WARN")
    spec = FetchSpec(n_hosts=args.hosts)
    cfg = CrawlConfig(
        max_fetches_per_host_per_round=getattr(args, "max_per_host", 4),
        round_capacity=(getattr(args, "capacity", 0) or None),
        adaptive_politeness=getattr(args, "adaptive", False),
        url_quality_filter=getattr(args, "url_quality_filter", False),
        content_dedup=getattr(args, "content_dedup", False),
        fetch_retries=getattr(args, "fetch_retries", 0) or 0,
        host_page_quota=(getattr(args, "host_quota", 0) or None),
        recrawl_every=(getattr(args, "recrawl_every", 0) or None),
        recrawl_interval=getattr(args, "recrawl_interval", 4),
        conditional_fetch=getattr(args, "conditional_fetch", False),
        ip_politeness_groups=(getattr(args, "ip_groups", 0) or None),
        ip_budget=getattr(args, "ip_budget", 4),
    )

    if args.cmd == "status":
        store = SnapshotStore(spark, args.ckpt)
        print(json.dumps(store.read_manifest(), indent=1))
        return 0
    if args.cmd == "vacuum":
        store = SnapshotStore(spark, args.ckpt)
        print(json.dumps(store.vacuum()))
        return 0
    if args.cmd == "init":
        seeds_df = spark.read.text(args.seeds).withColumnRenamed("value", "url")
        sitemaps_df = (
            spark.read.parquet(args.sitemaps) if getattr(args, "sitemaps", None) else None
        )
        st = rnd.init_crawl(
            spark, seeds_df, cfg, spec, ckpt=args.ckpt, sitemaps_df=sitemaps_df
        )
        print(json.dumps({"initialized": True, "next_round": st.next_round}))
        return 0
    if args.cmd == "run":
        seedless = SnapshotStore(spark, args.ckpt).last_complete_round()
        if seedless is None:
            print("no init state — run `init` first", file=sys.stderr)
            return 2
        st = rnd.resume(spark, args.ckpt, cfg, spec)
        infos = rnd.run_crawl(st, max_rounds=args.rounds)
        print(json.dumps(infos))
        return 0
    if args.cmd == "resume":
        st = rnd.resume(spark, args.ckpt, cfg, spec)
        infos = rnd.run_crawl(st, max_rounds=args.rounds)
        print(json.dumps(infos))
        return 0
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
