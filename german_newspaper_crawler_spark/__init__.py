"""german_newspaper_crawler_spark — a from-scratch PySpark-native crawl/extract/dedup engine.

Re-expresses the query and data-processing capabilities of the reference
``Scrottz/german_newspaper_crawler`` (a sequential Python + MongoDB crawler,
see ``/root/repo/SURVEY.md``) as an idiomatic Spark engine:

* a partitioned, priority-ordered **frontier** table (reference: ephemeral
  ``List[str]`` built per run, ``lib/common/web_requests.py:246-305``),
* an exact **URL-seen set** table + mergeable per-partition Bloom filter
  pre-check (reference: in-memory ``Set[str]`` of sha256 digests,
  ``scr/german_newspaper_crawler.py:66-74``),
* Arrow-vectorized fetch / parse / extract stages via ``mapInPandas``
  (reference: sequential per-URL loop, ``lib/common/web_requests.py:127``),
* image+caption payload with pHash near-duplicate suppression (graft per
  BASELINE.json ``north_rule``; reference dedups text via sha256),
* deterministic crawl ordering carried as data ``(priority, seq)`` columns —
  never inherited from execution order (reference: document-order selector
  ladder, ``lib/domain/taz.py:188-206``).

No per-row Python UDFs anywhere: all Python touchpoints are pandas/Arrow
(`pandas_udf`, `mapInPandas`, `applyInPandas`); everything relational is
built-in DataFrame API left to Catalyst/AQE.
"""

__version__ = "0.1.0"
