"""MERGE/upsert semantics (K1).

Reference sink: ``update_one({"$set": doc}, upsert=True)`` keyed on
``content_hash`` (else ``url``) — ``lib/common/mongodb.py:83-157``. Batch rows
replace matched rows, unmatched rows are inserted; retries are idempotent.

On an Iceberg catalog this is literally::

    MERGE INTO articles t USING batch s ON t.content_hash = s.content_hash
    WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *

Without a catalog (sandbox), the same result set is produced relationally:
``batch ∪ (base ANTI JOIN batch)`` — one shuffle on the key, no window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def merge_upsert(base: DataFrame, batch: DataFrame, keys: list[str]) -> DataFrame:
    """Return the post-MERGE state: batch wins on key match, union otherwise.

    ``batch`` must be unique per key (dedupe upstream — the crawl pipeline's
    anti-join + first-occurrence window guarantees this).
    """
    surviving_base = base.join(batch.select(*keys), on=keys, how="left_anti")
    return batch.unionByName(surviving_base)
