"""Document fingerprinting (rolling-hash min-sketch).

A winnowing-style content fingerprint: hash every w-char window of the
normalized text with the shared hash64 and keep the minimum — stable under
whitespace noise, cheap to compare, reproducible across engines. Explode of
positions happens JVM-side (sequence + substr), no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from german_newspaper_crawler_spark.functions.hashing import hash64
from german_newspaper_crawler_spark.functions.text import ws_normalize


def rolling_min_fingerprint(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    norm = F.lower(ws_normalize(F.col(text_col)))
    base = (
        df.where(F.length(F.trim(F.col(text_col))) >= window)
        .select(F.col(id_col), norm.alias("s"))
    )
    pos = base.select(
        id_col,
        "s",
        F.explode(F.sequence(F.lit(1), F.length("s") - (window - 1))).alias("i"),
    )
    sub = F.expr(f"substr(s, i, {window})")
    return (
        pos.withColumn("hv", hash64(sub))
        .groupBy(id_col)
        .agg(F.min("hv").alias("fingerprint"))
    )


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, w: int = 5
) -> DataFrame:
    """Winnowing (MOSS) fingerprints: hash every k-char gram of the
    lowercased whitespace-normalized text, keep the min of each sliding
    window of w positions, distinct per doc. Guarantee: any shared substring
    of length >= w + k - 1 yields a shared fingerprint. Pure window
    functions over a JVM-side position explode — no UDF. Output:
    (id_col, fingerprint)."""
    from pyspark.sql import Window

    nt = df.where(F.length(F.trim(text_col)) >= k + w - 1).select(
        F.col(id_col), F.lower(ws_normalize(text_col)).alias("s")
    )
    pos = nt.select(
        id_col, "s",
        F.explode(F.sequence(F.lit(1), F.length("s") - (k - 1))).alias("i"),
    )
    kg = pos.select(id_col, "i", hash64(F.expr(f"substr(s, i, {k})")).alias("h"))
    win = Window.partitionBy(id_col).orderBy("i").rowsBetween(0, w - 1)
    cnt = Window.partitionBy(id_col)
    wins = kg.select(
        id_col, "i",
        F.min("h").over(win).alias("wmin"),
        F.count("*").over(cnt).alias("n"),
    )
    return (
        wins.where(F.col("i") <= F.col("n") - (w - 1))
        .select(id_col, F.col("wmin").alias("fingerprint"))
        .distinct()
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 5,
) -> DataFrame:
    """Benchmark decontamination — the eval-hygiene op every training-data
    pipeline runs before training (C4/FineWeb-style): flag corpus documents
    sharing ANY winnowing fingerprint with the benchmark/eval set. The MOSS
    guarantee makes the flag conservative: every exact overlap of
    >= w + k - 1 normalized chars is caught.

    Plan shape at 100 TB: fingerprints on both sides are window functions
    (no UDF); the corpus side semi-joins the benchmark fingerprint set,
    which is tiny relative to the corpus (an eval suite, not a crawl) —
    AQE broadcasts it, so the corpus never shuffles on the fingerprint key.
    Output: every docs row's id + ``contaminated`` boolean."""
    fp_docs = winnowing_fingerprints(docs, id_col, text_col, k, w)
    fp_bench = winnowing_fingerprints(benchmark, id_col, text_col, k, w).select(
        "fingerprint"
    ).distinct()
    hits = (
        fp_docs.join(fp_bench, "fingerprint", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.select(id_col).join(hits, id_col, "left").select(
        id_col, F.coalesce("contaminated", F.lit(False)).alias("contaminated")
    )
