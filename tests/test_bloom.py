"""Bloom filter operator (G1): zero false negatives, bounded false
positives, OR-merge associativity, and the prefilter split semantics."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from german_newspaper_crawler_spark.functions.hashing import hash64
from german_newspaper_crawler_spark.operators import bloom


def sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def seen_df(spark):
    rows = [(sha(f"https://h{i % 7}.example/a{i}"), f"h{i % 7}.example") for i in range(2000)]
    return spark.createDataFrame(rows, ["content_hash", "host"])


def test_no_false_negatives_and_fpr(spark, seen_df):
    m, k = bloom.params_for(2000, fpr=0.01)
    blooms = bloom.build_bloom(
        seen_df, "content_hash", F.pmod(hash64("host"), F.lit(8)).cast("int"), m, k
    )
    assert blooms.count() <= 8

    # every seen hash must test maybe_seen=True (no false negatives)
    out = bloom.bloom_prefilter(
        seen_df, blooms, "content_hash", F.pmod(hash64("host"), F.lit(8)).cast("int")
    )
    assert out.where(~F.col("maybe_seen")).count() == 0

    # fresh hashes: false-positive rate near the design point
    fresh = spark.createDataFrame(
        [(sha(f"https://h{i % 7}.example/NEW{i}"), f"h{i % 7}.example") for i in range(2000)],
        ["content_hash", "host"],
    )
    fp = bloom.bloom_prefilter(
        fresh, blooms, "content_hash", F.pmod(hash64("host"), F.lit(8)).cast("int")
    ).where(F.col("maybe_seen")).count()
    assert fp / 2000 < 0.05  # design fpr 0.01 + slack


def test_merge_is_union(spark, seen_df):
    m, k = bloom.params_for(2000, fpr=0.01)
    bucket = F.pmod(hash64("host"), F.lit(4)).cast("int")
    half1 = seen_df.limit(1000)
    half2 = seen_df.subtract(half1)
    b1 = bloom.build_bloom(half1, "content_hash", bucket, m, k)
    b2 = bloom.build_bloom(half2, "content_hash", bucket, m, k)
    merged = bloom.merge_bloom_tables(b1.unionByName(b2))
    out = bloom.bloom_prefilter(seen_df, merged, "content_hash", bucket)
    assert out.where(~F.col("maybe_seen")).count() == 0  # union covers both halves


def test_unknown_bucket_is_fresh(spark, seen_df):
    m, k = bloom.params_for(100, fpr=0.01)
    blooms = bloom.build_bloom(
        seen_df.where(F.col("host") == "h0.example"),
        "content_hash",
        F.pmod(hash64("host"), F.lit(8)).cast("int"),
        m, k,
    )
    other = spark.createDataFrame([(sha("x"), "unbucketed.example")], ["content_hash", "host"])
    out = bloom.bloom_prefilter(
        other, blooms, "content_hash", F.pmod(hash64("host"), F.lit(8)).cast("int")
    )
    assert out.first()["maybe_seen"] is False
