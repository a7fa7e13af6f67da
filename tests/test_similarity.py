"""Similarity-search operators: LSH ANN recall vs the exact brute-force
baseline (the brute-force side itself is oracle-checked by the driver)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from german_newspaper_crawler_spark.operators.similarity import (
    brute_force_topk, lsh_bucketed_topk,
)

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_topk_recall_vs_bruteforce(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, "vec_id", "embedding", k=10)
    # these embeddings are near-gaussian (top-10 cosines only ~0.3-0.5 — the
    # LSH worst case), so recall needs short codes + many tables:
    # p_bucket = (1 - θ/π)^4 ≈ 0.16 per table at cos 0.4 → 16 tables ≈ 0.94
    approx = lsh_bucketed_topk(
        queries, emb, "vec_id", "embedding", k=10, n_planes=4, n_tables=16
    )
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.55, recall
    # scored similarities it does return must agree with the exact scorer
    ej = exact.select("query_id", "neighbor_id", F.col("cos_sim").alias("c1"))
    aj = approx.select("query_id", "neighbor_id", F.col("cos_sim").alias("c2"))
    diff = ej.join(aj, ["query_id", "neighbor_id"]).where(F.col("c1") != F.col("c2"))
    assert diff.count() == 0


def test_ivf_topk_recall_vs_bruteforce(spark):
    from german_newspaper_crawler_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    exact = brute_force_topk(queries, emb, "vec_id", "embedding", k=10)
    approx = ivf_topk(queries, emb, "vec_id", "embedding", k=10, n_lists=8, n_probe=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # probing half the cells on near-random vectors: recall well above the
    # n_probe/n_lists=0.5 chance floor
    assert recall >= 0.6, recall
    # deterministic across invocations (no RNG state anywhere)
    a2 = {(r["query_id"], r["neighbor_id"])
          for r in ivf_topk(queries, emb, "vec_id", "embedding", k=10,
                            n_lists=8, n_probe=4).collect()}
    assert a == a2
