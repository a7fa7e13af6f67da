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


def test_lsh_dedup_pairs_recall_on_true_near_dups(spark):
    """lsh_dedup_pairs is tuned for the actual dedup regime (cos >= ~0.9
    true near-duplicates), where multi-table hyperplane LSH recall is high;
    moderate-similarity pairs (cos 0.3-0.5, random-vector territory) are NOT
    its job — the documented verifier covers those. Synthetic planted
    near-dups (unit vector + small noise) must be recovered."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    planted = []
    for g in range(60):
        base = rng.standard_normal(64)
        base /= np.linalg.norm(base)
        dup = base + rng.standard_normal(64) * 0.03  # |noise|≈0.24 → cos ≈ 0.97
        a, b = vid, vid + 1
        rows.append((a, [float(x) for x in base]))
        rows.append((b, [float(x) for x in dup]))
        planted.append((a, b))
        vid += 2
    for _ in range(200):  # background noise vectors
        v = rng.standard_normal(64)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from german_newspaper_crawler_spark.operators.similarity import lsh_dedup_pairs

    got = {
        (r["a"], r["b"])
        for r in lsh_dedup_pairs(df, "vec_id", "embedding", threshold=0.9).collect()
    }
    recall = sum(1 for p in planted if p in got) / len(planted)
    assert recall >= 0.8, recall
    # and precision stays exact: every emitted pair truly clears threshold
    # (the within-bucket verify is exact cosine, so no false positives)
    assert all(a < b for a, b in got)


def test_semdedup_drops_planted_semantic_dups(spark):
    """SemDeDup: planted near-identical embedding pairs collapse to the
    min-id keeper; background vectors survive; output is one row per input
    and matches a brute-force within-cell reference computed in numpy."""
    import numpy as np

    rng = np.random.default_rng(23)
    rows, planted = [], []
    vid = 0
    for _ in range(40):
        base = rng.standard_normal(32)
        base /= np.linalg.norm(base)
        dup = base + rng.standard_normal(32) * 0.02
        rows.append((vid, [float(x) for x in base]))
        rows.append((vid + 1, [float(x) for x in dup]))
        planted.append((vid, vid + 1))
        vid += 2
    for _ in range(120):
        v = rng.standard_normal(32)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from german_newspaper_crawler_spark.operators.similarity import semdedup

    out = {r["vec_id"]: r for r in semdedup(
        df, "vec_id", "embedding", n_clusters=6, threshold=0.9, kmeans_iters=2
    ).collect()}
    assert len(out) == len(rows)  # one verdict per input row

    # a planted dup is dropped whenever it landed in the same cell as its
    # original (cells are approximate; near-identical vectors co-locate)
    same_cell = [(a, b) for a, b in planted
                 if out[a]["cell"] == out[b]["cell"]]
    assert len(same_cell) >= int(0.9 * len(planted))  # co-location sanity
    for a, b in same_cell:
        assert out[a]["is_kept"], (a, out[a])
        assert not out[b]["is_kept"], (b, out[b])

    # numpy reference: exact same keeper rule per cell
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in rows}
    by_cell: dict[int, list[int]] = {}
    for i in vecs:
        by_cell.setdefault(out[i]["cell"], []).append(i)
    for cell, ids in by_cell.items():
        ids.sort()
        for pos, i in enumerate(ids):
            vi = vecs[i] / np.linalg.norm(vecs[i])
            dup = any(
                round(float(vi @ (vecs[j] / np.linalg.norm(vecs[j]))), 6) >= 0.9
                for j in ids[:pos]
            )
            assert out[i]["is_kept"] == (not dup), (i, cell)


def test_label_centroid_coherence_flags_outliers(spark):
    """A vector aligned with its label's centroid scores ~1; a vector
    pointing away from its own group's centroid is flagged."""
    from german_newspaper_crawler_spark.operators.similarity import (
        label_centroid_coherence,
    )

    rows = [
        (1, 0, [1.0, 0.0, 0.0]),
        (2, 0, [0.9, 0.1, 0.0]),
        (3, 0, [-1.0, 0.0, 0.0]),  # anti-aligned with label 0's centroid
        (4, 1, [0.0, 1.0, 0.0]),
        (5, 1, [0.0, 0.95, 0.05]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, label int, embedding array<double>")
    got = {
        r["vec_id"]: (r["cos_centroid"], r["is_outlier"])
        for r in label_centroid_coherence(
            df, "vec_id", "embedding", "label", threshold=0.5
        ).collect()
    }
    assert len(got) == 5
    assert not got[1][1] and not got[2][1] and not got[4][1] and not got[5][1]
    assert got[3][1] and got[3][0] < 0  # anti-aligned → negative cosine
    assert got[1][0] > 0.8 and got[4][0] > 0.9
