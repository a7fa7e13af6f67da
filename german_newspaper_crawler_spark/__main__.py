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
    ap.add_argument("--rounds", type=int, default=None)
    ap.add_argument("--per-host-budget", type=int, default=None)
    ap.add_argument("--no-respect-delay", action="store_true")
    ap.add_argument("--no-bloom", action="store_true",
                    help="disable the persistent seen-set Bloom filter (G1)")
    ap.add_argument("--strict-refresh-replace", action="store_true",
                    help="U2 strict reference parity: per-domain seen scope")
    ap.add_argument("--spacy-model", default=None,
                    help="route enrichment through the spaCy tagger stage "
                         "(requires spacy + model in the deployment image)")
    args = ap.parse_args()

    from german_newspaper_crawler_spark.config import (
        load_config, load_seeds, load_store_config,
    )
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
    # config file's crawl: section provides defaults; flags override
    ccfg = load_config(args.config).get("crawl") or {}
    tagger = None
    if args.spacy_model:
        from german_newspaper_crawler_spark.operators.enrichment import SpacyTagger

        tagger = SpacyTagger(args.spacy_model)
    cfg = CrawlConfig(
        max_rounds=args.rounds if args.rounds is not None else int(ccfg.get("rounds", 4)),
        per_host_budget=(
            args.per_host_budget
            if args.per_host_budget is not None
            else ccfg.get("per_host_budget")
        ),
        respect_delay=not args.no_respect_delay and bool(ccfg.get("respect_delay", True)),
        use_robots_table=bool(ccfg.get("use_robots_table", True)),  # G2 always on for real crawls
        use_bloom=not args.no_bloom and bool(ccfg.get("use_bloom", True)),
        strict_refresh_replace=args.strict_refresh_replace,
        tagger=tagger,
        fetch_concurrency=int(ccfg.get("fetch_concurrency", 8)),  # parallel_fetcher.py:45
    )
    stats = run_crawl(spark, store, seeds_df, http_fetcher(), cfg=cfg)
    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
