"""Cuckoo-filter variant of the URL-seen negative cache (graft G1 — the
north rule names "Bloom/cuckoo-filter URL-seen set"; see also "A Learned
Cuckoo Filter for Approximate Membership Queries over Sliding Windows",
SIGMOD 2023, for why cuckoo filters fit windowed/expiring seen-sets).

Standard partial-key cuckoo filter (Fan et al., CoNEXT 2014): ``m`` buckets
× 4 slots of 16-bit fingerprints; item hashes to bucket ``i1`` and its
alternate ``i2 = i1 XOR H(fp)``; inserts relocate ("kick") existing
fingerprints up to a bounded number of times.

What it adds over the Bloom blobs (operators/bloom.py):

* **deletion** — a Bloom filter cannot unlearn. The reference's U2
  refresh-replace quirk and any TTL'd / re-crawlable seen policy need
  membership REMOVAL without a full rebuild: ``delete`` drops one
  fingerprint copy, after which lookups report fresh again.
* slightly better space at low FPR, and lookups touch exactly 2 buckets.

Same deployment shape as the Bloom path: one filter blob per hash-bucket
built distributedly (``applyInPandas``), broadcast into the probe side, and
used strictly as a negative cache — "no" skips the exact anti-join, "maybe"
falls through, so false positives cost a lookup, never a wrong answer.
Unlike Bloom blobs, two cuckoo filters do NOT merge by OR — incremental
maintenance goes through insert/delete on the blob (which is exactly what
deletion support is for).

Like bloom.py, digests are the 64-hex sha256 strings; h1/h2 come from hex
slices so build and probe agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StructField, StructType,
)

SLOTS = 4
MAX_KICKS = 500

CUCKOO_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("blob", BinaryType(), False),  # uint16[m][SLOTS]
        StructField("n_items", LongType(), False),
        StructField("m", LongType(), False),  # bucket count (power of 2)
    ]
)


def m_for(n_items: int, load: float = 0.84) -> int:
    """Bucket count (power of 2) for a target item count at a safe load
    factor (4-slot cuckoo filters fill to ~95%; 0.84 default headroom)."""
    need = max(int(n_items / (SLOTS * load)) + 1, 8)
    m = 1
    while m < need:
        m <<= 1
    return m


def _fp_and_index(hashes: pd.Series, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(fingerprint uint16 != 0, primary bucket index) from sha256 hex."""
    fp = (
        hashes.str.slice(0, 4).apply(int, base=16).to_numpy(dtype=np.uint64)
        % np.uint64(65535)
    ).astype(np.uint16) + np.uint16(1)
    i1 = (
        hashes.str.slice(4, 19).apply(int, base=16).to_numpy(dtype=np.uint64)
        % np.uint64(m)
    ).astype(np.int64)
    return fp, i1


def _alt_index(fp: np.ndarray, idx: np.ndarray, m: int) -> np.ndarray:
    """i2 = i1 XOR H(fp) — the partial-key relocation rule (involution, so
    alt(alt(x)) == x and either bucket recovers the other)."""
    h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(m)
    return (idx.astype(np.uint64) ^ h).astype(np.int64) % m


def _insert_all(table: np.ndarray, fp: np.ndarray, i1: np.ndarray, m: int) -> int:
    """Sequential insert with bounded kicks; returns number inserted (raises
    on overflow — callers size with m_for headroom)."""
    rng = np.random.default_rng(0)  # deterministic kick choice
    for f, i in zip(fp, i1):
        f = np.uint16(f)
        idx = int(i)
        placed = False
        for cand in (idx, int(_alt_index(np.array([f]), np.array([idx]), m)[0])):
            row = table[cand]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                placed = True
                break
        if placed:
            continue
        cur = int(_alt_index(np.array([f]), np.array([idx]), m)[0])
        for _ in range(MAX_KICKS):
            slot = int(rng.integers(0, SLOTS))
            f, table[cur][slot] = table[cur][slot], f
            cur = int(_alt_index(np.array([f]), np.array([cur]), m)[0])
            row = table[cur]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                placed = True
                break
        if not placed:
            raise RuntimeError("cuckoo filter overflow — size with m_for()")
    return len(fp)


def _contains(table: np.ndarray, hashes: pd.Series, m: int) -> np.ndarray:
    fp, i1 = _fp_and_index(hashes, m)
    i2 = _alt_index(fp, i1, m)
    hit1 = (table[i1] == fp[:, None]).any(axis=1)
    hit2 = (table[i2] == fp[:, None]).any(axis=1)
    return hit1 | hit2


def build_cuckoo(
    seen: DataFrame, hash_col: str, bucket_col, m: int
) -> DataFrame:
    """One cuckoo blob per hash-bucket from a DataFrame of hex digests —
    same distributed shape as bloom.build_bloom."""
    src = seen.select(F.col(hash_col).alias("h"), bucket_col.alias("bucket"))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        table = np.zeros((m, SLOTS), dtype=np.uint16)
        if len(pdf):
            fp, i1 = _fp_and_index(pdf["h"], m)
            _insert_all(table, fp, i1, m)
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0]) if len(pdf) else -1],
                "blob": [table.tobytes()],
                "n_items": [len(pdf)],
                "m": [m],
            }
        )

    return src.groupBy("bucket").applyInPandas(build, schema=CUCKOO_SCHEMA)


def delete_hashes(blob: bytes, hashes: pd.Series, m: int) -> tuple[bytes, int]:
    """Remove ONE fingerprint copy per hash (the operation Bloom cannot do —
    refresh-replace / TTL expiry of seen entries). Returns (new_blob,
    n_removed). Safe under the cuckoo contract: only delete items that were
    inserted, else an unrelated colliding fingerprint may be evicted."""
    table = np.frombuffer(blob, np.uint16).reshape(-1, SLOTS).copy()
    fp, i1 = _fp_and_index(hashes, m)
    i2 = _alt_index(fp, i1, m)
    removed = 0
    for f, a, b in zip(fp, i1, i2):
        for idx in (int(a), int(b)):
            slots = np.nonzero(table[idx] == f)[0]
            if len(slots):
                table[idx][slots[0]] = 0
                removed += 1
                break
    return table.tobytes(), removed


def cuckoo_prefilter(
    candidates: DataFrame, filters: DataFrame, hash_col: str, bucket_col
) -> DataFrame:
    """Split candidates: adds ``maybe_seen`` (False → provably fresh, skip
    the exact anti-join; True → fall through). Broadcast blob join, same
    contract as bloom.bloom_prefilter."""
    cand = candidates.withColumn("__bucket", bucket_col)
    joined = cand.join(
        F.broadcast(filters.withColumnRenamed("bucket", "__bucket")),
        "__bucket", "left",
    )

    @F.pandas_udf("boolean")
    def test(h: pd.Series, blob: pd.Series, m: pd.Series) -> pd.Series:
        out = np.zeros(len(h), dtype=bool)
        if len(h) == 0:
            return pd.Series(out)
        has = blob.notna().to_numpy()
        for key in set(blob[has]):
            mask = (blob == key).to_numpy() & has
            mm = int(m[mask].iloc[0])
            table = np.frombuffer(key, np.uint16).reshape(-1, SLOTS)
            out[mask] = _contains(table, h[mask], mm)
        return pd.Series(out, index=h.index)

    return joined.withColumn(
        "maybe_seen",
        F.when(F.col("blob").isNull(), F.lit(False)).otherwise(
            test(F.col(hash_col), F.col("blob"), F.col("m"))
        ),
    ).drop("blob", "m", "n_items", "__bucket")
