"""Similarity search over embedding columns (array<float>).

Brute-force cosine is the correctness baseline; the scale path buckets with
LSH (random-hyperplane signs derived from the shared hash64 so buckets are
reproducible) and verifies exactly within buckets. All dot products are
JVM-side ``zip_with``/``aggregate`` over double arrays — no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: str) -> F.Column:
    return F.expr(f"transform({col}, x -> cast(x as double))")


_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"


def _cosine(a: str, b: str) -> F.Column:
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    nb = F.sqrt(F.expr(_DOT.format(a=b, b=b)))
    return F.round(dot / (na * nb), 6)


def cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.4
) -> DataFrame:
    """All pairs with rounded cosine >= threshold (brute force — correctness
    baseline / within-bucket verifier). Output: (a, b, cos_sim[4dp])."""
    e = df.select(F.col(id_col).alias("id"), _as_double(vec_col).alias("v"))
    a = e.select(F.col("id").alias("a"), F.col("v").alias("va"))
    b = e.select(F.col("id").alias("b"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("a") < F.col("b")).withColumn("cos6", _cosine("va", "vb"))
    return (
        pairs.where(F.col("cos6") >= threshold)
        .select("a", "b", F.round("cos6", 4).alias("cos_sim"))
    )


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, id_col: str, vec_col: str, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors per query (query side broadcast).

    Deterministic tie-break on (rounded sim desc, neighbor id). Output:
    (query_id, neighbor_id, cos_sim, rk).
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("vq"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("vc"))
    scored = q.join(c, F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cos_sim", _cosine("vq", "vc")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rk").cast("long").alias("rk"))
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing, exact rerank in
    buckets, best-of-n_tables union. The scale path: corpus shuffles once on
    (table, bucket); only colliding (query, doc) pairs are scored.

    Hyperplanes are pseudo-random ±1 matrices derived deterministically from
    hash64 of (table, plane, dim-index) — reproducible across runs/engines
    with no RNG state.
    """
    import numpy as np

    from german_newspaper_crawler_spark.functions.hashing import hash64 as _h64  # noqa: F401

    # deterministic ±1 planes via sha256 of indices (driver-side, tiny)
    import hashlib as _hl

    def sign(t: int, p: int, d: int) -> float:
        hx = _hl.sha256(f"{t}:{p}:{d}".encode()).digest()
        return 1.0 if hx[0] & 1 else -1.0

    planes = [
        [[sign(t, p, d) for d in range(dim)] for p in range(n_planes)]
        for t in range(n_tables)
    ]

    def bucket_expr(side_vec: str, t: int) -> F.Column:
        bits = []
        for p in range(n_planes):
            coeffs = planes[t][p]
            arr = F.array(*[F.lit(c) for c in coeffs])
            dot = F.expr(
                f"aggregate(zip_with({side_vec}, __plane, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
            )
            bits.append(dot)
        return bits

    # Build bucket ids per table via a fold: sum(bit_p * 2^p)
    def with_buckets(df: DataFrame, vec: str, out: str) -> DataFrame:
        rows = []
        for ti in range(n_tables):
            expr_bits = None
            for p in range(n_planes):
                coeffs = planes[ti][p]
                terms = " + ".join(
                    f"element_at({vec}, {d + 1}) * ({coeffs[d]})" for d in range(dim)
                )
                bit = f"(CASE WHEN ({terms}) >= 0 THEN {1 << p} ELSE 0 END)"
                expr_bits = bit if expr_bits is None else f"{expr_bits} + {bit}"
            rows.append(F.expr(expr_bits).alias(f"__b{ti}"))
        df = df.select("*", *rows)
        buckets = F.array(
            *[
                F.struct(F.lit(ti).alias("tbl"), F.col(f"__b{ti}").alias("bkt"))
                for ti in range(n_tables)
            ]
        )
        return df.select(
            *[c for c in df.columns if not c.startswith("__b")],
            F.explode(buckets).alias(out),
        )

    q = with_buckets(
        queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("vq")),
        "vq",
        "qb",
    ).select("query_id", "vq", F.col("qb.tbl").alias("tbl"), F.col("qb.bkt").alias("bkt"))
    c = with_buckets(
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("vc")),
        "vc",
        "cb",
    ).select("neighbor_id", "vc", F.col("cb.tbl").alias("tbl"), F.col("cb.bkt").alias("bkt"))

    cand = (
        q.join(c, ["tbl", "bkt"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "vq", "neighbor_id", "vc")
        .distinct()
    )
    scored = cand.withColumn("cos_sim", _cosine("vq", "vc"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rk").cast("long").alias("rk"))
    )
