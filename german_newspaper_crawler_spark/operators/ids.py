"""Dense, deterministic id assignment (W1/A3).

Reference: a process-wide thread-locked counter hands out ``_id`` in creation
order (``lib/common/object_model.py:11-27,189-193``), with the high-water mark
bumped to ``max(existing ids)`` on load (``object_model.py:23-27,310-317``).

Distributed formulation: ids are a *function of an explicit order key*, never
of execution order. A naive ``row_number() OVER (ORDER BY ...)`` collapses to
a single partition — unusable at 10^10 rows — so this is the classic
two-phase assignment:

1. range-partition + sort by the order key (persisted so the sampled range
   bounds are computed once and reused),
2. count rows per partition (tiny driver-side list, one long per partition),
3. ``mapInPandas`` adds ``cumulative_offset[pid] + local position``.

Everything stays Arrow-batched; the only driver materialization is the
per-partition count vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from pyspark import StorageLevel


def assign_ids(
    df: DataFrame,
    order_cols: list[str],
    offset: int = 0,
    id_col: str = "_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign dense ids ``offset+1, offset+2, ...`` in ``order_cols`` order."""
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ordered = (
        df.repartitionByRange(parts, *[F.col(c) for c in order_cols])
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # one row per partition — safe to collect at any scale
    counts = {
        r["__pid"]: r["n"]
        for r in ordered.groupBy("__pid").agg(F.count("*").alias("n")).collect()
    }
    starts: dict[int, int] = {}
    acc = offset
    for pid in sorted(counts):
        starts[pid] = acc
        acc += counts[pid]

    out_schema = StructType(
        [StructField(id_col, LongType(), False)] + list(df.schema.fields)
    )

    def add_ids(batches):
        import pandas as pd

        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pos is None:
                pos = starts[int(pdf["__pid"].iloc[0])]
            ids = range(pos + 1, pos + 1 + len(pdf))
            pos += len(pdf)
            out = pdf.drop(columns=["__pid"])
            out.insert(0, id_col, pd.Series(list(ids), index=out.index, dtype="int64"))
            yield out

    result = ordered.mapInPandas(add_ids, schema=out_schema)
    return result
