"""X1/X3 parser registry dispatch + coercion; O3 chunk packing; per-host
budget multi-round draining (O4 graft)."""

from __future__ import annotations

from datetime import datetime

from german_newspaper_crawler_spark.functions.text import chunk_text_by_paragraphs
from german_newspaper_crawler_spark.parse.registry import (
    coerce_result, parse_with_registry, register_parser,
)


def test_coerce_result_variants():
    # dict passes through with missing fields None (web_requests.py:26-28)
    d = coerce_result({"url": "u", "text": "t"}, "fallback", "<h>")
    assert d["url"] == "u" and d["text"] == "t" and d["autor"] is None
    # raw string → degenerate strip parse (web_requests.py:29)
    d = coerce_result("<p>Hello <b>World</b></p>", "u2", "ignored")
    assert d["text"].split() == ["Hello", "World"]
    assert d["html"] == "<p>Hello <b>World</b></p>"
    # None → minimal from fetched html (web_requests.py:145-150)
    d = coerce_result(None, "u3", "<p>Body</p>")
    assert d["url"] == "u3" and d["text"].strip() == "Body"


def test_registry_dispatch_and_arity_fallback():
    register_parser("toy", lambda url, html: {"url": url, "text": "TOY:" + html})
    assert parse_with_registry("toy", "u", "x")["text"] == "TOY:x"

    def single_arg(url):  # arity fallback (web_requests.py:136-143)
        return {"url": url, "text": "ONE"}

    register_parser("toy1", single_arg)
    assert parse_with_registry("toy1", "u", "x")["text"] == "ONE"

    def raises(url, html):
        raise ValueError("boom")

    register_parser("toyerr", raises)
    out = parse_with_registry("toyerr", "u", "<p>h</p>")  # log-and-continue
    assert out["text"].strip() == "h"
    # unknown domain → default reference-faithful parser
    out = parse_with_registry("unknown", "u", "<article><p>Real body.</p></article>")
    assert out["text"] == "Real body."


def test_chunk_packing_reference_semantics():
    # greedy packing (pos_tagging.py:49-81): joins with \n\n while it fits
    assert chunk_text_by_paragraphs("aa\n\nbb\n\ncc", 7) == ["aa\n\nbb", "cc"]
    # over-long paragraph sliced
    assert chunk_text_by_paragraphs("x" * 10, 4) == ["xxxx", "xxxx", "xx"]
    # blanks dropped, empty text → []
    assert chunk_text_by_paragraphs("", 5) == []
    assert chunk_text_by_paragraphs("a\n\n\n\n  \n\nb", 10) == ["a\n\nb"]


def test_per_host_budget_drains_over_rounds(spark, tmp_path):
    """O4 graft: budget=2 per host per round → the frontier drains across
    multiple rounds and the final article set equals the unbudgeted crawl."""
    from german_newspaper_crawler_spark.fixtures import make_fixtures
    from german_newspaper_crawler_spark.plans.crawl import CrawlConfig, run_crawl
    from german_newspaper_crawler_spark.sources.fetch import table_fetcher
    from german_newspaper_crawler_spark.sources.store import SnapshotStore

    seeds, pages, blobs, _ = make_fixtures(n_hosts=2, articles_per_host=6)
    seeds_df = spark.createDataFrame(
        [(s["domain"], s["base_url"], s["host"], s["collection"]) for s in seeds],
        ["domain", "base_url", "host", "collection"],
    )
    results = {}
    for budget in (None, 2):
        store = SnapshotStore(str(tmp_path / f"b{budget}"))
        cfg = CrawlConfig(
            n_buckets=8, max_rounds=12, per_host_budget=budget,
            parsed_ts=datetime(2026, 1, 2), extract_images=False,
            fetch_concurrency=4 if budget else 1,  # also exercises S6 threads
        )
        run_crawl(spark, store, seeds_df, table_fetcher(pages, blobs), cfg=cfg)
        results[budget] = {
            r["url"] for r in store.read(spark, "articles").select("url").collect()
        }
    assert results[2] == results[None]
    assert len(results[2]) > 0
