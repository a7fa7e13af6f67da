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
