"""Connected components over near-duplicate pair edges → dedup clusters.

The near-dup operators (pHash banded-hamming, n-gram Jaccard, MinHash+LSH,
embedding cosine) emit pair edges; a training-data pipeline then needs the
*clusters* — each document labeled with a canonical representative so one
keeper survives per cluster. Implemented as iterative min-label propagation
(large-star/small-star style) on DataFrames:

    label(v) ← min(label(v), min(label(u) for u~v))   until fixpoint

Each iteration is one join + groupBy (shuffle on vertex id); convergence in
O(log n) rounds for typical near-dup components (which are tiny — pairs and
small cliques), with an explicit cap. Driver checks only the tiny converged
flag per round — no collect of data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_iter: int = 20
) -> DataFrame:
    """(a, b) pair edges → (id, component) with component = min member id.

    Isolated vertices don't appear (callers left-join and coalesce to self —
    see :func:`dedup_keepers`).
    """
    sym = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionByName(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    ).distinct()
    # the edge lineage may be an expensive derivation (shingle join, banded
    # LSH...) — materialize it ONCE; every iteration re-reads sym
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    if labels.isEmpty():  # no edges → no non-trivial components
        return labels
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nmin"))
        )
        # the changed flag is a pure function of (component, nmin) — carry
        # it through the checkpoint instead of re-joining the old labels
        # afterwards (one join + shuffle per iteration saved; the flag scan
        # below reads the materialized checkpoint)
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nmin"), F.col("component"))
                ).alias("component"),
                (F.col("nmin") < F.col("component")).alias("__changed"),
            )
        )
        # checkpoint FIRST (truncates lineage), then detect change from the
        # materialized frame — counting before the checkpoint would execute
        # the join lineage twice per round (measured ~1/3 of the loop cost)
        labels = new_labels.localCheckpoint(eager=True)
        changed = labels.where("__changed").limit(1).count()
        labels = labels.drop("__changed")
        if changed == 0:
            break
    return labels


def dedup_keepers(
    df: DataFrame, id_col: str, edges: DataFrame, a: str = "a", b: str = "b"
) -> DataFrame:
    """Label every row with its dedup cluster + keeper flag.

    keeper = the min-id member of the component (isolated rows keep
    themselves) — the reference's min-_id-wins convention (A3 analog).
    Output: df columns + (component, is_keeper).
    """
    comp = connected_components(edges, a, b)
    out = df.join(comp, df[id_col] == comp.id, "left").drop("id")
    out = out.withColumn("component", F.coalesce("component", F.col(id_col)))
    return out.withColumn("is_keeper", F.col(id_col) == F.col("component"))
