"""SparkSession factory tuned for the crawl/extract workload.

Centralizes the configuration that matters at 100 TB scale:

* AQE on (runtime coalesce + skew-join splitting),
* Arrow on for every pandas-UDF boundary (the only Python touchpoints),
* small Arrow batches when shipping multi-MB binary image rows
  (``maxRecordsPerBatch``) so a batch of rows fits in worker memory,
* shuffle partitions sized to the cluster (caller passes cores; a real
  cluster deployment would set this to 2-3x total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _local_k(master: str, fallback: int) -> int:
    """Parse K from ``local[K]`` (``*`` → machine cores); cluster masters
    fall back to the configured cpu count."""
    if master.startswith("local[") and master.endswith("]"):
        n = master[6:-1]
        if n == "*":
            return os.cpu_count() or fallback
        try:
            return int(n)
        except ValueError:
            return fallback
    return fallback


def _heap(master: str, fallback_cpus: int) -> str:
    """Driver/executor heap sized to parallelism: 1.5g per local core,
    min 8g, capped at 48g. Env override: SPARK_GRAFT_DRIVER_MEM."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    k = _local_k(master, fallback_cpus)
    return f"{max(8, min(3 * k // 2, 48))}g"


def get_spark(
    app_name: str = "german_newspaper_crawler_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records_per_batch: int = 2048,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback 32)
    for the sandbox; on a real cluster callers pass ``None`` after
    configuring via spark-submit and master is left untouched.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps every stage wide
        # without tiny-task overhead; cluster mode should use 2-3x cores.
        n = master[master.index("[") + 1 : -1] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    # resolve the heap ONCE — an extra_conf driver-memory override must
    # also size -Xms, or the pretouch flag below would ask for more than
    # -Xmx and kill the JVM at initialization
    heap = (extra_conf or {}).get("spark.driver.memory") or _heap(master, cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(arrow_max_records_per_batch),
        )
        # binary image rows are large; keep file-split sizing moderate so a
        # scan task's partition fits executor memory at 100 TB inputs.
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # heap scales with cores (min 8g, capped 48g so concurrent
        # subprocess JVMs can't overcommit the 128 GiB box): allocation
        # rate is proportional to task parallelism, and an N→4N executor
        # scale-up brings 4N heaps on a real cluster — a fixed heap at
        # high core counts turns GC into a false serial bottleneck
        .config("spark.driver.memory", heap)
        # ParallelGC: the enrichment stages allocate hundreds of millions of
        # short-lived structs; G1's concurrent machinery collapses under 32
        # allocation-heavy task threads (measured 8x slower than ParallelGC
        # on the pos-tag transform). -Xms=heap + AlwaysPreTouch: commit and
        # zero the whole heap at JVM start — a lazily-committed large heap
        # page-faults INSIDE the hot stages (measured 2.6x on a pure
        # codegen stage at 16 cores, 32g heap: 9.0 -> 23.3M rows/s). On a
        # cluster the same flags go to spark.executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            f"-XX:+UseParallelGC -Xms{heap} -XX:+AlwaysPreTouch",
        )
        # cached round batches carry html_gz / image bytes that are already
        # deflate-compressed — columnar re-compression is pure CPU waste
        # (measured ~12% of the fused crawl stage); cache footprint stays
        # bounded by the round's pop budget, not the corpus
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
