"""Partition-count determinism of the oracled battery's riskiest queries.

The driver may run the correctness compare at a different local[K] /
shuffle-partition setting than our own checks: any query whose VALUES depend
on partitioning (window tie-breaks, collect_list order, two-phase id
assignment, driver-side sampling) would pass here and fail there. This test
executes the queries that have such machinery in a SUBPROCESS session with
deliberately awkward parallelism (local[3], shuffle=3) and compares a
sha256 over the sorted canonical row multiset against the main session's.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"

# the machinery-bearing subset: windows + collect_list (ngram), two-phase id
# assignment (legacy, w1), driver-side centroid sampling (ivf), banded joins
# + iterative components (g6x), chunk UDF (o3), rank tie-breaks (ann_lsh),
# composed pipeline (curation)
RISKY = [
    "dedup_ngram_jaccard", "legacy_normalize_records", "ann_ivf_topk",
    "ann_lsh_topk", "g6x_phash_components_keepers", "o3_chunk_packing",
    "curation_pipeline", "dedup_embedding_lsh_pairs", "w1_a3_id_assignment",
    # the 8 queries registered after the r2 driver snapshot — their first
    # driver CORRECTNESS row lands in r3, so pre-clear the partitioning-
    # sensitivity risks here (float agg order, window ties, two-phase cumsum)
    "decontaminate_against_benchmark", "dedup_containment",
    "pack_training_sequences", "sample_stratified_mix",
    "text_charbigram_logprob", "text_redact_pii", "text_repetition_metrics",
    "dedup_components_keepers",
    # r3: the crawl image leg's suppression operator, batch form
    "g6y_phash_seen_suppression",
    # r3: SemDeDup — driver-side centroid sample + per-cell applyInPandas
    "dedup_semantic_semdedup",
    # r3: corpus-wide paragraph dedup — min(struct) winner must not depend
    # on partitioning
    "text_paragraph_dedup",
    # r4: exact substring dedup — min(struct) winners + doc-local running
    # sum + sort_array(collect_list) rebuild must not depend on partitioning
    "text_substring_dedup",
    # r4: centroid avg (float agg order) + classifier (bag sums — exact
    # bigints, gated anyway)
    "embed_label_coherence_outliers",
    "text_quality_classifier_hashed",
    # r4: HLL sketch — integer register sum must be partition-independent
    "sketch_hll_distinct_users",
    # r4: PageRank — per-iteration float sums + 6dp re-rounding
    "graph_pagerank_hosts",
    # r4: count-min — exact integer counters, gated anyway
    "sketch_countmin_user_counts",
    # r5: BM25 — per-doc float sum pinned by a sequential term-order fold
    "text_bm25_scores",
    # r5: TF-IDF top-k — window order must be total (6dp round + term
    # tiebreak) regardless of input partitioning
    "text_tfidf_top_terms",
    # r5: histogram quantiles — estimate must be a pure function of bin
    # counts (integer cum windows), never of row order
    "sketch_quantile_doclen",
    # r5: authority pop — window ties + salted two-phase + global top-k
    # must be a total order (url tiebreak), partition-independent
    "o4x_authority_pop",
]


def value_hash(df) -> tuple[int, str]:
    from tests.oracle_check import canon_rows

    counter, cols = canon_rows(df.toPandas())
    payload = json.dumps(
        {"cols": cols, "rows": sorted((list(k), v) for k, v in counter.items())},
        ensure_ascii=False,
    )
    return sum(counter.values()), hashlib.sha256(payload.encode()).hexdigest()


SNIPPET = """
import json, sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
from german_newspaper_crawler_spark.session import get_spark
from tests.test_partition_determinism import value_hash

spark = get_spark(app_name="det-check", master="local[3]", shuffle_partitions=3)
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
out = {{name: value_hash(qs[name](spark, {sf!r})) for name in {risky!r}}}
print("DETRESULT " + json.dumps(out))
spark.stop()
"""


def test_risky_queries_partition_count_invariant(spark):
    import __spark_entry__ as e

    qs = e.queries()
    local = {name: value_hash(qs[name](spark, SF)) for name in RISKY}

    out = subprocess.run(
        [sys.executable, "-c", SNIPPET.format(repo=REPO, risky=RISKY, sf=SF)],
        capture_output=True, text=True, cwd=REPO, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("DETRESULT ")][-1]
    remote = json.loads(line[len("DETRESULT "):])
    for name in RISKY:
        assert tuple(remote[name]) == local[name], name
