"""robots.txt cache with TTL (graft G2 — no reference analog; the reference
fetches unconditionally, ``lib/common/web_requests.py:15-20``).

The ``robots`` store table is keyed by host with a ``fetched_at`` TTL: each
crawl round refreshes only hosts that are new or expired (one tiny fetch
batch through the same politeness-aware fetch machinery), then the round's
fetch stages consult the merged cache. Parsing implements the subset the
north rule needs: ``User-agent: *`` sections' ``Disallow:`` prefixes and
``Crawl-delay:`` seconds.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from german_newspaper_crawler_spark import schemas
from german_newspaper_crawler_spark.sources.store import SnapshotStore


def parse_robots_txt(text: str) -> tuple[list[str], int]:
    """(disallow_prefixes, crawl_delay_ms) from the ``User-agent: *``
    group(s). Empty/missing robots.txt → allow-all, no delay."""
    disallow: list[str] = []
    delay_ms = 0
    applies = False
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            applies = val == "*"
        elif applies and key == "disallow" and val:
            disallow.append(val)
        elif applies and key == "crawl-delay":
            try:
                delay_ms = int(float(val) * 1000)
            except ValueError:
                pass
    return disallow, delay_ms


def refresh_robots(
    spark: SparkSession,
    store: SnapshotStore,
    hosts: list[str],
    fetcher,
    now: datetime,
    ttl_hours: int = 24,
) -> dict[str, tuple[list[str], int]]:
    """Return the robots dict for this round's hosts, refreshing stale/new
    entries through the fetcher and committing them to the robots table.

    The host list is a per-round driver-side set (bounded by the pop batch's
    distinct hosts — at 10^10 scale this becomes a DataFrame join against the
    robots table with the same TTL predicate; the dict is broadcast-sized
    either way: one row per host).
    """
    cached: dict[str, tuple[list[str], int, datetime]] = {}
    if store.exists("robots"):
        for r in store.read(spark, "robots").collect():
            cached[r["host"]] = (
                list(r["disallow_prefixes"] or []),
                r["crawl_delay_ms"] or 0,
                r["fetched_at"],
            )
    cutoff = now - timedelta(hours=ttl_hours)
    stale = [
        h for h in hosts if h not in cached or cached[h][2] is None or cached[h][2] < cutoff
    ]
    new_rows = []
    for host in stale:
        try:
            status, text, _ = fetcher(f"https://{host}/robots.txt")
        except Exception:
            status, text = 0, ""
        dis, delay = parse_robots_txt(text if status == 200 else "")
        cached[host] = (dis, delay, now)
        new_rows.append((host, text if status == 200 else "", dis, delay, now))
    if new_rows:
        store.merge(
            spark,
            "robots",
            spark.createDataFrame(new_rows, schemas.ROBOTS),
            keys=["host"],
        )
    return {h: (v[0], v[1]) for h, v in cached.items()}
