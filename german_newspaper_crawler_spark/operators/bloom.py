"""Mergeable per-partition Bloom filter for the URL-seen set (graft G1).

Reference behavior replaced: the exact in-memory ``Set[str]`` of sha256
digests (``scr/german_newspaper_crawler.py:66-74``). At 10^10 URLs the exact
set lives in the ``seen`` table and the anti-join (J1) remains the
**authority**; the Bloom filter is only a negative-cache accelerator — a
membership "no" skips the join for the (overwhelmingly common) fresh URL,
a "yes" falls through to the exact check. False positives therefore cost a
join lookup, never a wrong answer.

Design:
* plain numpy bit array; k hash probes derived from the two halves of the
  row's sha256 (Kirsch-Mitzenmacher double hashing) — no external libs,
* built distributedly: ``applyInPandas`` per bucket builds one filter blob
  per partition; blobs merge by OR (associative, so partial filters from
  incremental runs union cleanly),
* persisted as binary rows ``(bucket, blob, n_items, k, m)`` in the store —
  hydrated per fetch/dedup round and applied inside the Arrow batch.

Why Spark's built-in runtime bloom-join is insufficient (SURVEY §4.2): it
lives only within one query's runtime; this filter must persist across crawl
rounds and runs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StructField, StructType,
)

BLOOM_SCHEMA = StructType(
    [
        StructField("bucket", IntegerType(), False),
        StructField("blob", BinaryType(), False),
        StructField("n_items", LongType(), False),
        StructField("k", IntegerType(), False),
        StructField("m", LongType(), False),
    ]
)


def params_for(n_items: int, fpr: float = 0.01) -> tuple[int, int]:
    """(m bits, k hashes) for a target false-positive rate."""
    n = max(n_items, 1)
    m = max(64, int(-n * math.log(fpr) / (math.log(2) ** 2)))
    m = (m + 63) // 64 * 64
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def _probe_positions(hashes: pd.Series, m: int, k: int) -> np.ndarray:
    """(len, k) probe bit positions from sha256 hex digests (vectorized).

    h_i = (h1 + i*h2) mod m with h1/h2 from the first/second 15 hex chars —
    standard double hashing; identical across build and query sides.
    """
    h1 = hashes.str.slice(0, 15).apply(int, base=16).to_numpy(dtype=np.uint64)
    h2 = hashes.str.slice(15, 30).apply(int, base=16).to_numpy(dtype=np.uint64)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _set_bits(bits: np.ndarray, pos: np.ndarray) -> None:
    flat = pos.ravel()
    np.bitwise_or.at(bits, flat >> 3, (1 << (flat & 7)).astype(np.uint8))


def _test_bits(bits: np.ndarray, pos: np.ndarray) -> np.ndarray:
    """row-wise AND over k probes → bool array (possibly-present)."""
    byte = bits[pos >> 3]
    hit = (byte & (1 << (pos & 7)).astype(np.uint8)) != 0
    return hit.all(axis=1)


def build_bloom(
    seen: DataFrame, hash_col: str, bucket_col, m: int, k: int
) -> DataFrame:
    """Build one Bloom blob per bucket from a DataFrame of hex digests.
    ``bucket_col`` is any Column expression (e.g. pmod(hash64(host), P))."""
    src = seen.select(F.col(hash_col).alias("h"), bucket_col.alias("bucket"))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(m // 8, dtype=np.uint8)
        if len(pdf):
            _set_bits(bits, _probe_positions(pdf["h"], m, k))
        return pd.DataFrame(
            {
                "bucket": [int(pdf["bucket"].iloc[0]) if len(pdf) else -1],
                "blob": [bits.tobytes()],
                "n_items": [len(pdf)],
                "k": [k],
                "m": [m],
            }
        )

    return src.groupBy("bucket").applyInPandas(build, schema=BLOOM_SCHEMA)


def merge_blooms(a: bytes, b: bytes) -> bytes:
    """OR-merge two blobs (associative/commutative — incremental builds)."""
    return (
        np.frombuffer(a, np.uint8) | np.frombuffer(b, np.uint8)
    ).tobytes()


def merge_bloom_tables(blooms: DataFrame) -> DataFrame:
    """Collapse multiple blob generations per bucket into one (OR)."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.frombuffer(pdf["blob"].iloc[0], np.uint8).copy()
        for blob in pdf["blob"].iloc[1:]:
            bits |= np.frombuffer(blob, np.uint8)
        out = pdf.iloc[[0]].copy()
        out["blob"] = [bits.tobytes()]
        out["n_items"] = [int(pdf["n_items"].sum())]
        return out

    return blooms.groupBy("bucket").applyInPandas(merge, schema=BLOOM_SCHEMA)


def bloom_prefilter(
    candidates: DataFrame,
    blooms: DataFrame,
    hash_col: str,
    bucket_col,
) -> DataFrame:
    """Split candidates into (definitely-fresh, maybe-seen).

    Adds a ``maybe_seen`` boolean: False → provably not in the seen set
    (skip the exact anti-join for these rows); True → must fall through to
    the exact check. The blob join is a broadcast (one small row per bucket).
    """
    cand = candidates.withColumn("__bucket", bucket_col)
    joined = cand.join(
        F.broadcast(blooms.withColumnRenamed("bucket", "__bucket")),
        "__bucket",
        "left",
    )

    @F.pandas_udf("boolean")
    def test(h: pd.Series, blob: pd.Series, k: pd.Series, m: pd.Series) -> pd.Series:
        out = np.zeros(len(h), dtype=bool)
        if len(h) == 0:
            return pd.Series(out)
        has = blob.notna().to_numpy()
        groups: dict[bytes, np.ndarray] = {}
        for key in set(blob[has]):
            groups[key] = (blob == key).to_numpy() & has
        for key, mask in groups.items():
            bits = np.frombuffer(key, np.uint8)
            kk, mm = int(k[mask].iloc[0]), int(m[mask].iloc[0])
            pos = _probe_positions(h[mask], mm, kk)
            out[mask] = _test_bits(bits, pos)
        return pd.Series(out, index=h.index)

    return joined.withColumn(
        "maybe_seen",
        F.when(F.col("blob").isNull(), F.lit(False)).otherwise(
            test(F.col(hash_col), F.col("blob"), F.col("k"), F.col("m"))
        ),
    ).drop("blob", "k", "m", "n_items", "__bucket")
