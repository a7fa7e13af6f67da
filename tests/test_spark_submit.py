"""North-rule deployment path: the job ships as `spark-submit --py-files
gncs.zip` (no install on executors). This test builds the zip, launches a
REAL spark-submit from a clean cwd (repo not importable), and runs a fixture
crawl end-to-end — proving driver AND python workers resolve the package
from the shipped archive."""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = """
import json
from datetime import datetime

import german_newspaper_crawler_spark as g
from german_newspaper_crawler_spark.fixtures import make_fixtures
from german_newspaper_crawler_spark.plans.crawl import CrawlConfig, run_crawl
from german_newspaper_crawler_spark.session import get_spark
from german_newspaper_crawler_spark.sources.fetch import table_fetcher
from german_newspaper_crawler_spark.sources.store import SnapshotStore

spark = get_spark(app_name="pyfiles-smoke", master="local[2]", shuffle_partitions=2)

# prove the PYTHON WORKERS import the package from the shipped zip
def probe(it):
    import german_newspaper_crawler_spark as gw
    for pdf in it:
        pdf["path"] = gw.__file__
        yield pdf

paths = {
    r["path"]
    for r in spark.range(4).mapInPandas(probe, "id long, path string").collect()
}

seeds, pages, blobs, _ = make_fixtures(n_hosts=1, articles_per_host=3)
store = SnapshotStore("{STORE}")
seeds_df = spark.createDataFrame(
    [(s["domain"], s["base_url"], s["host"], s["collection"]) for s in seeds],
    ["domain", "base_url", "host", "collection"],
)
stats = run_crawl(
    spark, store, seeds_df, table_fetcher(pages, blobs),
    cfg=CrawlConfig(n_buckets=4, max_rounds=2, parsed_ts=datetime(2026, 1, 2),
                    extract_images=False),
)
print("RESULT " + json.dumps({
    "driver_path": g.__file__,
    "worker_paths": sorted(paths),
    "articles": stats["articles"],
}))
spark.stop()
"""


def build_zip(zip_path: str) -> None:
    pkg = os.path.join(REPO, "german_newspaper_crawler_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for dirpath, _, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files_packaging(tmp_path):
    zip_path = str(tmp_path / "gncs.zip")
    build_zip(zip_path)
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER.replace("{STORE}", str(tmp_path / "store")))

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--py-files", zip_path, str(driver)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("RESULT ")][-1]
    res = json.loads(line[len("RESULT "):])
    # driver imported the package from the shipped zip, not from the repo
    assert "gncs.zip" in res["driver_path"], res
    # every python worker resolved it from the zip too
    assert res["worker_paths"] and all(
        "gncs.zip" in p for p in res["worker_paths"]
    ), res
    assert res["articles"] > 0  # the crawl actually ran end-to-end
