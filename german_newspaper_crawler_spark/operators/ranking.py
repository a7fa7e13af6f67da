"""Lexical relevance ranking — Okapi BM25 (Robertson & Walker 1994; the
Lucene-default scoring function).

No reference analog (nearest: the anchor-text selection gates,
taz.py:217-241) — this is the retrieval primitive a training-data pipeline
uses for targeted corpus selection (e.g. DoReMi-style domain weighting or
quality-by-query mining at 10^10 documents): score every document against
a small query-term set and keep the top slice.

Scale shape — pure DataFrame algebra, no UDF:

* tokenize + explode only terms IN the query set (the filter lands before
  the explode's shuffle: per-(doc, term) counts over |Q| terms, not the
  whole vocabulary),
* document frequency per term = one partial-aggregatable groupBy over the
  (doc, term) pairs (≤ |Q| groups),
* N and avgdl are a 1-row aggregate broadcast to the scoring join (the
  whitelisted scalar-denominator pattern),
* per-doc score = sum of per-term weights — the final groupBy shuffles on
  doc id (uniform), state ∝ matched docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(id, bm25[6dp], n_matched) for every document matching ≥ 1 query
    term. IDF is the Lucene variant ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (never negative); tf saturates via ``k1`` and normalizes by document
    length against the corpus average via ``b``. All counts (tf, df, N,
    dl) are exact integers; the float expression is identical on the
    DuckDB oracle side and rounds 6dp (repo convention)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    docs = (
        df.select(F.col(id_col).alias("id"), toks.alias("tk"))
        .where(F.size("tk") >= 1)
    )
    lens = docs.select("id", F.size("tk").cast("long").alias("dl"))
    scalars = lens.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        docs.select("id", F.explode("tk").alias("term"))
        .where(F.col("term").isin(list(query_terms)))
        .groupBy("id", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    w = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    # per-doc sum as a SEQUENTIAL fold in term order (array_sort →
    # aggregate), not F.sum: float addition is order-sensitive and the
    # partial-agg order is partitioning-dependent — the fold pins the IEEE
    # order both engines replay (the label_centroid_coherence precedent)
    fold = F.expr(
        "aggregate(transform(array_sort(collect_list(struct(term, __w))),"
        " x -> x.__w), cast(0 as double), (a, x) -> a + x)"
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "id")
        .crossJoin(F.broadcast(scalars))
        .withColumn("__w", w)
        .groupBy("id")
        .agg(
            F.round(fold, 6).alias("bm25"),
            F.count("*").cast("long").alias("n_matched"),
        )
        .select(F.col("id").alias(id_col), "bm25", "n_matched")
    )
