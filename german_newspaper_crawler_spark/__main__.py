"""spark-submit entry point.

    spark-submit --py-files gncs.zip -m ... german_newspaper_crawler_spark \
        --config configs/config.yaml --store /data/gncs --rounds 4

Runs crawl rounds with the real HTTP fetcher against the configured seed
list, resuming from the store's last committed snapshots (T2/G7). In local
development it builds its own session via the tuned factory.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser(prog="german_newspaper_crawler_spark")
    ap.add_argument("--config", default=None)
    ap.add_argument("--store", default=None)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--per-host-budget", type=int, default=None)
    ap.add_argument("--no-respect-delay", action="store_true")
    args = ap.parse_args()

    from german_newspaper_crawler_spark.config import load_seeds, load_store_config
    from german_newspaper_crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from german_newspaper_crawler_spark.session import get_spark
    from german_newspaper_crawler_spark.sources.fetch import http_fetcher
    from german_newspaper_crawler_spark.sources.store import SnapshotStore

    spark = get_spark(app_name="gncs-crawl")
    seeds = load_seeds(args.config)
    if not seeds:
        raise SystemExit("no domains configured (config 'domains:' section)")
    store_cfg = load_store_config(args.config)
    store = SnapshotStore(args.store or store_cfg.root)
    seeds_df = spark.createDataFrame(
        [(s.domain, s.base_url, s.host, s.collection) for s in seeds],
        ["domain", "base_url", "host", "collection"],
    )
    cfg = CrawlConfig(
        max_rounds=args.rounds,
        per_host_budget=args.per_host_budget,
        respect_delay=not args.no_respect_delay,
        use_robots_table=True,  # real crawls always honor robots.txt (G2)
        fetch_concurrency=8,  # reference library-path default (parallel_fetcher.py:45)
    )
    stats = run_crawl(spark, store, seeds_df, http_fetcher(), cfg=cfg)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
