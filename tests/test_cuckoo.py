"""Cuckoo-filter seen-cache (G1 variant): zero false negatives, sane FPR,
DELETION (the capability Bloom lacks), distributed build + prefilter split."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from german_newspaper_crawler_spark.operators.cuckoo import (
    SLOTS, _contains, _fp_and_index, _insert_all, delete_hashes, m_for,
)


def sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def _table_with(hashes: list[str], m: int) -> np.ndarray:
    table = np.zeros((m, SLOTS), dtype=np.uint16)
    fp, i1 = _fp_and_index(pd.Series(hashes), m)
    _insert_all(table, fp, i1, m)
    return table


def test_no_false_negatives_and_bounded_fpr():
    inserted = [sha(f"u{i}") for i in range(5000)]
    m = m_for(5000)
    table = _table_with(inserted, m)
    assert _contains(table, pd.Series(inserted), m).all()  # zero false negs
    fresh = pd.Series([sha(f"x{i}") for i in range(20000)])
    fpr = _contains(table, fresh, m).mean()
    # 4-slot/16-bit-fp theoretical FPR ≈ 2*4/2^16 per bucket pair ≈ 0.012%
    assert fpr < 0.01, fpr


def test_delete_restores_freshness():
    """The Bloom-impossible operation: remove a collection's hashes → those
    URLs read as fresh again (U2 refresh-replace / TTL expiry), everything
    else stays seen."""
    keep = [sha(f"keep{i}") for i in range(1000)]
    drop = [sha(f"drop{i}") for i in range(200)]
    m = m_for(1200)
    table = _table_with(keep + drop, m)
    blob, removed = delete_hashes(table.tobytes(), pd.Series(drop), m)
    assert removed == 200
    t2 = np.frombuffer(blob, np.uint16).reshape(-1, SLOTS)
    assert _contains(t2, pd.Series(keep), m).all()  # survivors intact
    # deleted entries: no false negatives promised only for members — after
    # removal they may still collide with survivors' fingerprints, so assert
    # the overwhelming majority reads fresh (exact at these sizes)
    assert _contains(t2, pd.Series(drop), m).mean() < 0.02


def test_duplicate_inserts_delete_one_copy_each():
    h = [sha("dup")] * 3 + [sha("other")]
    m = m_for(16)
    table = _table_with(h, m)
    blob, removed = delete_hashes(table.tobytes(), pd.Series([sha("dup")]), m)
    assert removed == 1
    t2 = np.frombuffer(blob, np.uint16).reshape(-1, SLOTS)
    assert _contains(t2, pd.Series([sha("dup")]), m).all()  # 2 copies remain


def test_overflow_raises():
    small_m = 8  # 32 slots
    with pytest.raises(RuntimeError):
        _table_with([sha(f"o{i}") for i in range(64)], small_m)


def test_distributed_build_and_prefilter_split(spark):
    from pyspark.sql import functions as F

    from german_newspaper_crawler_spark.functions.hashing import hash64
    from german_newspaper_crawler_spark.operators.cuckoo import (
        build_cuckoo, cuckoo_prefilter,
    )

    cand = spark.range(3000).select(
        F.col("id"),
        F.sha2(F.concat(F.lit("u"), F.col("id").cast("string")), 256).alias("h"),
    )
    seen = cand.where(F.col("id") % 3 == 0)
    bucket = F.pmod(hash64("h"), F.lit(8)).cast("int")
    filters = build_cuckoo(seen, "h", bucket, m_for(2000))
    got = {
        r["id"]: r["maybe_seen"]
        for r in cuckoo_prefilter(cand, filters, "h", bucket).collect()
    }
    # zero false negatives: every seen row is maybe_seen
    assert all(got[i] for i in range(0, 3000, 3))
    # fresh rows overwhelmingly provably-absent
    fresh_flags = [got[i] for i in range(3000) if i % 3 != 0]
    assert sum(fresh_flags) / len(fresh_flags) < 0.01
