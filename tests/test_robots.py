"""G2 robots table: parsing, TTL refresh, enforcement through the crawl."""

from __future__ import annotations

from datetime import datetime

from german_newspaper_crawler_spark.operators.robots import (
    parse_robots_txt, refresh_robots,
)
from german_newspaper_crawler_spark.sources.store import SnapshotStore


def test_parse_robots_txt():
    txt = """
    # comment
    User-agent: evilbot
    Disallow: /

    User-agent: *
    Disallow: /intern/
    Disallow: /tmp/
    Crawl-delay: 1.5

    User-agent: otherbot
    Disallow: /x/
    """
    dis, delay = parse_robots_txt(txt)
    assert dis == ["/intern/", "/tmp/"]
    assert delay == 1500
    assert parse_robots_txt("") == ([], 0)
    assert parse_robots_txt("User-agent: *\nDisallow:") == ([], 0)  # allow-all


def test_refresh_robots_ttl_and_cache(spark, tmp_path):
    calls: list[str] = []

    def fetcher(url):
        calls.append(url)
        if "h1" in url:
            return 200, "User-agent: *\nDisallow: /private/\nCrawl-delay: 2", None
        return 404, "", None

    store = SnapshotStore(str(tmp_path))
    t1 = datetime(2026, 1, 1, 0, 0, 0)
    got = refresh_robots(spark, store, ["h1.example", "h2.example"], fetcher, now=t1)
    assert got["h1.example"] == (["/private/"], 2000)
    assert got["h2.example"] == ([], 0)  # 404 → allow-all
    assert len(calls) == 2

    # within TTL: cache hit, no refetch
    t2 = datetime(2026, 1, 1, 12, 0, 0)
    got2 = refresh_robots(spark, store, ["h1.example"], fetcher, now=t2, ttl_hours=24)
    assert got2["h1.example"] == (["/private/"], 2000)
    assert len(calls) == 2

    # past TTL: refetched
    t3 = datetime(2026, 1, 3, 0, 0, 0)
    refresh_robots(spark, store, ["h1.example"], fetcher, now=t3, ttl_hours=24)
    assert len(calls) == 3


def test_crawl_uses_robots_table(spark, tmp_path):
    """use_robots_table: the dossier page is disallowed via a robots.txt
    fixture → blocked in the frontier, never upserted."""
    from german_newspaper_crawler_spark.fixtures import make_fixtures
    from german_newspaper_crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from german_newspaper_crawler_spark.sources.fetch import table_fetcher
    from german_newspaper_crawler_spark.sources.store import SnapshotStore
    from pyspark.sql import functions as F

    seeds, pages, blobs, _ = make_fixtures(n_hosts=1, articles_per_host=4)
    host = seeds[0]["host"]
    pages[f"https://{host}/robots.txt"] = (200, "User-agent: *\nDisallow: /dossier/")
    store = SnapshotStore(str(tmp_path / "s"))
    seeds_df = spark.createDataFrame(
        [(s["domain"], s["base_url"], s["host"], s["collection"]) for s in seeds],
        ["domain", "base_url", "host", "collection"],
    )
    cfg = CrawlConfig(
        n_buckets=8, max_rounds=3, parsed_ts=datetime(2026, 1, 2),
        extract_images=False, use_robots_table=True,
    )
    run_crawl(spark, store, seeds_df, table_fetcher(pages, blobs), cfg=cfg)
    urls = {r["url"] for r in store.read(spark, "articles").select("url").collect()}
    assert not any("/dossier/" in u for u in urls)
    assert any("/artikel/" in u for u in urls)
    fr = store.read(spark, "frontier")
    blocked = {r["url"] for r in fr.where(F.col("state") == "blocked").collect()}
    assert any("/dossier/" in u for u in blocked)
    assert store.exists("robots")
