"""CLI entry point (__main__.py): config-file crawl section + flags drive a
full fixture crawl through main()."""

from __future__ import annotations

import json
import sys


def test_cli_main_runs_fixture_crawl(spark, tmp_path, monkeypatch, capsys):
    import german_newspaper_crawler_spark.__main__ as cli
    from german_newspaper_crawler_spark import config as cfgmod
    from german_newspaper_crawler_spark.fixtures import make_fixtures
    from german_newspaper_crawler_spark.sources import fetch as fetchmod
    from german_newspaper_crawler_spark.sources.store import SnapshotStore

    seeds, pages, blobs, _ = make_fixtures(n_hosts=1, articles_per_host=4)
    for s in seeds:
        pages[f"https://{s['host']}/robots.txt"] = (200, "User-agent: *\n")

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(
        "domains:\n"
        + "".join(
            f"  - name: {s['domain']}\n    collection: {s['collection']}\n"
            f"    base_url: {s['base_url']}\n" for s in seeds
        )
        + f"storage:\n  root: {tmp_path / 'store'}\n"
        + "crawl:\n  rounds: 3\n  respect_delay: false\n  use_bloom: true\n"
    )
    cfgmod._CACHE.clear()

    # the CLI builds its own session + http fetcher — inject the fixture
    # fetcher and reuse the test session
    monkeypatch.setattr(
        fetchmod, "http_fetcher",
        lambda *a, **k: fetchmod.table_fetcher(pages, blobs),
    )
    import german_newspaper_crawler_spark.session as sess

    monkeypatch.setattr(sess, "get_spark", lambda **k: spark)
    # main() stops its session on exit (K3) — keep the shared test session
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    monkeypatch.setattr(
        sys, "argv", ["gncs", "--config", str(cfg_path), "--no-respect-delay"]
    )
    cli.main()

    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["articles"] > 0 and stats["rounds"] >= 2

    store = SnapshotStore(str(tmp_path / "store"))
    assert store.exists("articles") and store.exists("robots")
    assert store.exists("blooms")  # config crawl: use_bloom honored
    urls = {r["url"] for r in store.read(spark, "articles").collect()}
    assert any("/artikel/" in u for u in urls)
