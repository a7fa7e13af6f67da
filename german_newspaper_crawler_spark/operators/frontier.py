"""Priority-queue frontier over the table store (G4).

Reference behavior replaced: an ephemeral per-run ordered ``List[str]``
consumed sequentially (``lib/common/web_requests.py:105-116,127``); ordering
produced by the selector ladder (``lib/domain/taz.py:188-206``, SURVEY §1.5).
Here the ordering is data: ``(domain_rank, priority, seq)`` columns, where
``priority`` = selector rank of the anchor's first surviving occurrence and
``seq`` = its document position. Pop = per-host ranked window with a
politeness budget.

Scale notes (10^10 URLs):
* partition key = ``bucket = pmod(hash64(host), n_buckets)`` — a host never
  spans buckets, so politeness state is partition-local (G3),
* mega-host skew (spiegel/bild/faz): fetch work per host is *politeness-
  bound* (sequential per host by design), so a mega-host cannot be
  parallelized away — the per-host pop budget caps the per-round skew and
  the large bucket count spreads distinct hosts across executors; the
  discovery/dedup shuffles key on url hashes, which are uniform,
* state transitions are MERGE-on-url against the frontier table — at scale
  an Iceberg MERGE with bucket(host) partition pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from german_newspaper_crawler_spark.functions.hashing import hash64
from german_newspaper_crawler_spark.functions.urls import host_of


def bucket_of(host_col, n_buckets: int) -> F.Column:
    return F.pmod(hash64(host_col), F.lit(n_buckets)).cast("int")


def frontier_from_seeds(seeds: DataFrame, n_buckets: int) -> DataFrame:
    """Seed rows → pending listing-frontier rows, ordered by config position
    (reference: domains processed in config order,
    scr/german_newspaper_crawler.py:76). The unpartitioned rank window is
    bounded by CONFIG size (one row per configured domain), never by data —
    the one place a global window is acceptable."""
    w = Window.orderBy("domain")
    return seeds.select(
        F.col("base_url").alias("url"),
        F.col("host"),
        bucket_of(F.col("host"), n_buckets).alias("bucket"),
        F.lit(0).alias("priority"),
        (F.row_number().over(w) - 1).cast("long").alias("seq"),
        F.lit("listing").alias("kind"),
        F.lit("pending").alias("state"),
        F.lit(0).alias("round"),
        F.col("domain"),
        F.col("base_url"),
        F.lit(None).cast("string").alias("anchor_text"),
        F.current_timestamp().alias("discovered_at"),
    )


def pop_batch(
    frontier: DataFrame, per_host_budget: int | None = None,
    skew_salt: int = 16,
    authority: DataFrame | None = None,
    round_budget: int | None = None,
) -> DataFrame:
    """Select the next fetch batch: pending rows ranked by the explicit
    order key within each host; optional per-host budget (O4 + G3/G4).

    per_host_budget=None reproduces the reference exactly (consume the whole
    ordered list); a budget bounds per-round host skew at scale.

    Mega-host skew-splitting (the north rule's spiegel/bild/faz case,
    SURVEY §7.3): a naive per-host rank window puts a 10^6-row host's whole
    pending set in ONE window partition. With a budget, the top-k runs in
    two exact phases: (1) rank within the SALTED key ``(host,
    pmod(hash64(url), skew_salt))`` and keep ≤ budget per cell — any row in
    the global per-host top-budget is necessarily in its cell's top-budget,
    so no candidate is lost; (2) the exact (priority, seq, url) rank within
    host over the ≤ budget·skew_salt survivors. Identical result, fattest
    window partition cut by the salt factor.

    Link-authority priority (VERDICT-r4 #2; the signal the reference lacks
    — its priority is selector rank only, taz.py:188-206): ``authority`` is
    a small (host, auth_bucket) frame (lower bucket = higher PageRank,
    maintained by the crawl loop) that BROADCAST-left-joins onto the
    pending set; unknown hosts sort last within their selector rank. The
    order key becomes ``(priority, auth_bucket, seq, url)`` — within one
    host the bucket is constant, so per-host pop order is unchanged; the
    bucket decides ACROSS hosts, which matters when ``round_budget`` caps
    the total rows popped per round: the global exact top-k (per-partition
    partial top-k merged once — Spark's TakeOrderedAndProject, no full
    sort) fills from high-authority hosts first, i.e. fetch budget shifts
    toward link authority. Both knobs default off; the default path is
    bit-identical to the reference-parity pop (o4 oracle unchanged).
    """
    pending = frontier.where(F.col("state") == "pending")
    order = [F.col("priority"), F.col("seq"), F.col("url")]
    if authority is not None:
        pending = (
            pending.join(
                F.broadcast(authority.select("host", "auth_bucket")),
                "host", "left",
            )
            .withColumn(
                "__auth", F.coalesce("auth_bucket", F.lit(2**31 - 1))
            )
            .drop("auth_bucket")
        )
        order = [F.col("priority"), F.col("__auth"), F.col("seq"), F.col("url")]
    if per_host_budget is not None:
        if skew_salt and skew_salt > 1:
            salt = F.pmod(hash64(F.col("url")), F.lit(skew_salt)).cast("int")
            w1 = Window.partitionBy(F.col("host"), salt).orderBy(*order)
            pending = (
                pending.withColumn("__rk1", F.row_number().over(w1))
                .where(F.col("__rk1") <= per_host_budget)
                .drop("__rk1")
            )
        w = Window.partitionBy("host").orderBy(*order)
        pending = (
            pending.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") <= per_host_budget)
            .drop("__rk")
        )
    if round_budget is not None:
        # exact global top-k: TakeOrderedAndProject computes a partial
        # top-k per partition and merges once — never a full global sort
        pending = pending.orderBy(*order).limit(round_budget)
    return pending.drop("__auth") if authority is not None else pending


def anchors_to_frontier(
    anchors: DataFrame, round_no: int, n_buckets: int, kind: str = "article"
) -> DataFrame:
    """Surviving anchor rows (already validity-filtered, absolutized,
    hash-skipped, first-occurrence-deduped) → pending frontier rows.

    ``priority``/``seq`` carry the selector-ladder order (SURVEY §1.5):
    pop order ``(priority, seq)`` replays the reference's list order.
    """
    return anchors.select(
        F.col("abs_url").alias("url"),
        host_of("abs_url").alias("host"),
        bucket_of(host_of("abs_url"), n_buckets).alias("bucket"),
        F.col("sel_rank").alias("priority"),
        F.col("doc_pos").cast("long").alias("seq"),
        F.lit(kind).alias("kind"),
        F.lit("pending").alias("state"),
        F.lit(round_no).alias("round"),
        F.col("domain"),
        F.col("base_url"),
        F.col("anchor_text"),
        F.current_timestamp().alias("discovered_at"),
    )


def authority_bucket(rank_col) -> F.Column:
    """log2-quantized authority bucket from a 6dp-rounded PageRank:
    ``bucket = 20 - floor(log2(round(rank · 10^6)))`` with the floor-log2
    computed as integer bin-length — EXACT integer ops (no float log, so
    no engine-dependent last-ulp flips at power-of-two boundaries; the
    same trick the HLL rho uses). rank 1.0 → bucket 0, 0.5 → 1, ...,
    1e-6 → 19; monotone decreasing in rank, lower = more authority. A
    pure per-row function — no global window over hosts — so bucketing
    scales to 10^7 hosts."""
    m = F.greatest(F.round(rank_col * 1e6).cast("long"), F.lit(1))
    return (F.lit(20) - F.length(F.bin(m))).cast("int")


def authority_from_frontier(
    frontier: DataFrame, iterations: int = 3
) -> DataFrame:
    """(host, rank, auth_bucket) from the OBSERVED host graph: every
    frontier row witnesses a discovery edge ``host(base_url) → host(url)``
    (the page's domain linked to the row's host). PageRank over the
    distinct edge set, then log2-quantized via :func:`authority_bucket`.
    Lower bucket = more authority.

    Returns ``None`` when the frontier has no cross-host edges yet (a
    fresh seed-only frontier); callers skip the refresh then.
    """
    from german_newspaper_crawler_spark.operators.sketches import pagerank

    edges = (
        frontier.select(
            host_of("base_url").alias("src"), F.col("host").alias("dst")
        )
        .where(
            F.col("src").isNotNull() & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
    )
    if edges.isEmpty():
        return None
    ranks = pagerank(edges, "src", "dst", iterations=iterations)
    return ranks.select(
        F.col("node").alias("host"),
        F.col("pagerank").alias("rank"),
        authority_bucket(F.col("pagerank")).alias("auth_bucket"),
    )


def first_occurrence_dedup(anchors: DataFrame, url_col: str = "abs_url") -> DataFrame:
    """W2: keep each URL's first surviving occurrence by (sel_rank, doc_pos)
    — including its anchor_text, which feeds the text-hash skip
    (taz.py:217-218,232-241)."""
    w = Window.partitionBy(url_col).orderBy("sel_rank", "doc_pos")
    return (
        anchors.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
