"""The crawl pipeline — frontier-pop → fetch → parse → dedup → merge loop.

Spark re-expression of the reference's ``main()`` (SURVEY §3.1): one Spark
job per crawl round, rounds looped on the driver until the frontier is empty
or budget exhausted. The reference's sequential per-URL loop
(``lib/common/web_requests.py:127-220``) becomes per-stage DataFrames; its
ordering guarantees are carried as ``(domain, priority, seq)`` columns; its
in-memory hash set becomes the ``seen`` table + anti-joins.

Stage map (reference → here):
  build_article_urls / TAZ.fetch_article_urls  → fetch_parse_listings_stage
  fetch_url loop                               → fused into the parse stages
  parse_article (taz.py:302-365)               → fetch_parse_articles_stage
  hash skip (web_requests.py:182-193)          → seen anti-joins (J1)
  pos_tag_object (pos_tagging.py:169-227)      → enrich_pos_tags (SQL) or
                                                 operators.enrichment.enrich_stage
  upsert_article (mongodb.py:83-157)           → store.merge on content_hash
  known_hashes.add (web_requests.py:218-219)   → store.append('seen', ...)
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from functools import reduce
from operator import and_
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, IntegerType, LongType, StringType,
    StructField, StructType, TimestampType,
)

from german_newspaper_crawler_spark import schemas
from german_newspaper_crawler_spark.functions import hashing
from german_newspaper_crawler_spark.functions.urls import href_valid
from german_newspaper_crawler_spark.operators import frontier as FR
from german_newspaper_crawler_spark.sources.fetch import Fetcher
from german_newspaper_crawler_spark.sources.store import SnapshotStore


@dataclass
class CrawlConfig:
    n_buckets: int = 64
    per_host_budget: int | None = None  # None = reference semantics (drain)
    max_rounds: int = 4
    respect_delay: bool = False
    parsed_ts: datetime | None = None  # injected clock (F10 determinism)
    extract_images: bool = True
    # per-partition cross-host fetch concurrency (reference library path
    # max_workers=8, parallel_fetcher.py:45); politeness stays per-host
    fetch_concurrency: int = 1
    # G2: maintain the robots table (TTL cache) per round instead of a
    # caller-provided dict; robots.txt fetched through the same fetcher
    use_robots_table: bool = False
    robots_ttl_hours: int = 24
    # G1 accelerator: Bloom-prefilter the seen-set checks (exact anti-join
    # remains the authority). Pays off when the seen set is huge relative to
    # the per-round batch (the 10^10 regime); off by default at fixture scale.
    use_bloom: bool = False
    bloom_buckets: int = 16
    bloom_fpr: float = 0.01
    # G6 in the crawl: suppress fetched images whose pHash is within this
    # hamming radius of any previously ACCEPTED image (persistent seen_phash
    # side table) or of an earlier image in the same batch — the distributed
    # generalization of the reference's post-fetch exact-hash skip
    # (web_requests.py:182-193). 0 falls back to exact-phash dedup only.
    phash_max_hamming: int = 4
    pos_tag_cap: int = 50_000  # MAX_POS_TAG_ENTRIES (pos_tagging.py:13)
    pos_tag_skip: int = 200_000  # MAX_POS_TAG_TOKENS (pos_tagging.py:14)
    # fold accumulated frontier merge-deltas back into one base file set
    # every N rounds (Iceberg rewrite_data_files cadence); keeps the
    # merge-on-read delta chain short without per-round full rewrites
    compact_every: int = 8
    # after compaction, expire unreferenced snapshot dirs beyond this time-
    # travel window (Iceberg expire_snapshots cadence); None keeps all
    expire_keep_last: int | None = 20
    # run-log retention (reference logging.retentions_day analog): rotate
    # the logs table down to this many snapshots at run end; 0 disables
    log_keep_snapshots: int = 500
    # T2 recurring-crawl semantics: re-enqueue the seed listing pages even
    # when a frontier already exists (the reference is re-run on a schedule
    # and always starts from the config seeds, scr:76). Article/image rows
    # discovered from the re-fetched listings still pass through the seen /
    # seen_phash anti-joins, so only genuinely new content lands. Off by
    # default: a resumed SAME-run crawl must not re-fetch finished listings.
    reseed_listings: bool = False
    # U2 strict reference parity: scope the seen anti-join to the current
    # collection/domain only, reproducing web_requests.py:222-229 where
    # known_hashes is REPLACED by the refreshed single-collection set after
    # each domain — so multi-domain runs re-process cross-domain duplicates
    # exactly like the reference. Default keeps the documented deviation
    # (global union seen-set; SURVEY §1.4).
    strict_refresh_replace: bool = False
    # G4+: link-authority frontier priority (VERDICT-r4 #2 — PageRank's own
    # motivation: at 10^10 URLs link authority decides which hosts deserve
    # fetch budget; the reference's priority is selector rank only,
    # taz.py:188-206). When on, a host_rank table is refreshed from the
    # OBSERVED host graph every authority_refresh_every rounds (write via
    # merge_delta ∝ ranked hosts) and pop order becomes (selector rank,
    # pagerank bucket, seq) — which shifts budget toward high-authority
    # hosts whenever round_budget caps the per-round batch. Off by default:
    # the flag-off pop is bit-identical to reference parity (o4 oracle).
    authority_priority: bool = False
    authority_refresh_every: int = 2
    authority_iterations: int = 3
    # global cap on rows popped per round (None = uncapped). Exact top-k by
    # the pop order via TakeOrderedAndProject — with authority_priority this
    # is the lever that reallocates fetch budget across hosts.
    round_budget: int | None = None
    # X4 spaCy-shaped enrichment: a Tagger object (operators/enrichment.py)
    # routes articles through the mapInPandas enrich_stage (per-worker model
    # cache, chunk packing, mutation-aware hash recompute). None keeps the
    # pure-SQL whitespace path (JVM-side, identical result — the fast
    # default; enrich_stage(WhitespaceTagger()) ≡ enrich_pos_tags, asserted
    # in tests/test_enrichment.py).
    tagger: object | None = None


# --- listing parse (P3 flatmap: 1 listing row → N anchor rows) ---------------

_ANCHOR_SCHEMA = StructType(
    [
        StructField("page_url", StringType()),
        StructField("domain", StringType()),
        StructField("base_url", StringType()),
        StructField("href", StringType()),
        StructField("anchor_text", StringType()),
        StructField("sel_rank", IntegerType()),  # -1 = per-page status marker row
        StructField("doc_pos", LongType()),
        StructField("status", IntegerType()),
    ]
)


def refill_from_anchors(
    anchors: DataFrame, seen: DataFrame, round_no: int, cfg: CrawlConfig,
    scope_col: str | None = None,
) -> DataFrame:
    """Anchor rows → new pending frontier rows, reproducing the reference's
    link-collection skip order (taz.py:210-247):

    1. validity filter (P1) on the *stripped* href,
    2. absolutize via plain urljoin (F5 — no canonicalization, so the
       seen-set digests match the reference bit-for-bit),
    3. per-instance known-hash skip: url-hash OR (non-empty) anchor-text-hash
       against ``seen`` — anti-joins J1,
    4. first-occurrence dedup by (sel_rank, doc_pos) (W2),
    """
    from german_newspaper_crawler_spark.functions.urls import urljoin_batch

    @F.pandas_udf(StringType())
    def urljoin_udf(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
        return urljoin_batch(bases, hrefs)

    cand = (
        anchors.withColumn("href", F.trim("href"))
        .where(href_valid("href"))
        .withColumn("abs_url", urljoin_udf(F.col("base_url"), F.col("href")))
        .withColumn("url_hash", hashing.sha256_hex("abs_url"))
        .withColumn(
            "text_hash",
            F.when(
                F.col("anchor_text") != "", F.sha2(F.trim("anchor_text"), 256)
            ),
        )
    )
    sel = [F.col("content_hash").alias("h")]
    if scope_col:  # U2 strict mode: a hash only skips same-scope anchors
        sel.append(F.col(scope_col).alias("__scope"))
    seen_h = seen.select(*sel).distinct()
    for hcol in ("url_hash", "text_hash"):
        cond = cand[hcol] == seen_h["h"]
        if scope_col:
            cond = cond & (cand[scope_col] == seen_h["__scope"])
        cand = cand.join(seen_h, cond, "left_anti")
    deduped = FR.first_occurrence_dedup(cand)
    return FR.anchors_to_frontier(deduped, round_no, cfg.n_buckets, kind="article")


# --- article parse (P4/P5/G5) -------------------------------------------------

_FIG = StructType([StructField("src", StringType()), StructField("caption", StringType())])
_ARTICLE_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("domain", StringType()),
        StructField("base_url", StringType()),
        StructField("priority", IntegerType()),
        StructField("seq", LongType()),
        StructField("status", IntegerType()),
        StructField("titel", StringType()),
        StructField("teaser", StringType()),
        StructField("autor", StringType()),
        StructField("category", StringType()),
        StructField("published_date", TimestampType()),
        # html is stored zlib-compressed: raw page html is the fattest column
        # (10-100 KB/row) and at 100 TB scale it must not stream uncompressed
        # through Arrow/shuffle/storage. Logical html = zlib.decompress
        # (utf-8). Identity hashes are computed python-side over the RAW
        # strings (hashlib ≡ sha2, bit-identical), so the digests still match
        # the reference exactly.
        StructField("html_gz", BinaryType()),
        StructField("text", StringType()),
        StructField("figures", ArrayType(_FIG)),
        StructField("content_hash", StringType()),
        StructField("url_hash", StringType()),
        StructField("text_content_hash", StringType()),
        StructField("is_pdf_like", BooleanType()),
    ]
)


def fetch_parse_articles_stage(
    batch: DataFrame,
    fetcher,
    robots: dict | None = None,
    respect_delay: bool = False,
    n_partitions: int | None = None,
    concurrency: int = 1,
) -> DataFrame:
    """Fused fetch+parse for article rows — ONE mapInPandas, so the html
    payload crosses the Arrow boundary once (JVM sends ~100-byte url rows in,
    gets parsed rows out). This is the stage whose throughput the 100 TB
    target scales with; a split fetch→parse stage pair would move every page
    three times and bottleneck on serialization bandwidth, not CPU.
    Robots-blocked rows (status -403) are dropped here (never fetched →
    no article row)."""
    from german_newspaper_crawler_spark.sources.fetch import (
        fetch_pandas_batch, stage_input,
    )

    robots = robots or {}
    src = stage_input(batch, n_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import zlib

        from german_newspaper_crawler_spark.parse.registry import parse_with_registry

        def sha(s: str) -> str:
            return hashlib.sha256(s.encode("utf-8")).hexdigest()

        last_fetch: dict[str, float] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            f = fetch_pandas_batch(pdf, fetcher, robots, respect_delay, last_fetch, concurrency)
            rows = []
            for r in f.itertuples(index=False):
                # robots-blocked rows stay (for frontier bookkeeping) with an
                # empty parse; downstream filters status != -403 before upsert
                html = r.html or ""
                d = parse_with_registry(r.domain, r.url, html)
                text = d["text"] or ""
                # identity per §1.4 (object_model.py:195-214 +
                # web_requests.py:159-175), python-side so raw html never
                # crosses the Arrow boundary
                is_http = r.url.startswith(("http://", "https://"))
                url_hash = sha(r.url) if is_http else None
                data = (text or html or "").strip()
                text_hash = sha(data) if data else None
                content_hash = url_hash if is_http else text_hash
                rows.append(
                    (
                        r.url, r.host, r.domain, r.base_url, r.priority, r.seq,
                        r.status, d["titel"], d["teaser"], d["autor"], d["category"],
                        d["published_date"],
                        zlib.compress(html.encode("utf-8"), 1),
                        text, d["figures"],
                        content_hash, url_hash, text_hash,
                        bool(html) and html.lstrip().startswith("%PDF"),
                    )
                )
            yield pd.DataFrame(rows, columns=[f_.name for f_ in _ARTICLE_SCHEMA.fields])

    return src.mapInPandas(run, schema=_ARTICLE_SCHEMA)


def fetch_parse_listings_stage(
    batch: DataFrame,
    fetcher,
    robots: dict | None = None,
    respect_delay: bool = False,
    n_partitions: int | None = None,
    concurrency: int = 1,
) -> DataFrame:
    """Fused fetch + anchor-ladder extraction for listing rows (the P3
    flatmap): listing html never leaves the Python worker."""
    from german_newspaper_crawler_spark.sources.fetch import (
        fetch_pandas_batch, stage_input,
    )

    robots = robots or {}
    src = stage_input(batch, n_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from german_newspaper_crawler_spark.parse.html import extract_anchors

        last_fetch: dict[str, float] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            f = fetch_pandas_batch(pdf, fetcher, robots, respect_delay, last_fetch, concurrency)
            rows = []
            for r in f.itertuples(index=False):
                # per-page status marker (sel_rank=-1) for frontier bookkeeping
                rows.append((r.url, r.domain, r.base_url, None, None, -1, -1, r.status))
                for href, text, rank, pos in extract_anchors(r.html or ""):
                    rows.append((r.url, r.domain, r.base_url, href, text, rank, pos, r.status))
            yield pd.DataFrame(rows, columns=[f_.name for f_ in _ANCHOR_SCHEMA.fields])

    return src.mapInPandas(run, schema=_ANCHOR_SCHEMA)


_IMAGE_OUT = StructType(
    list(schemas.IMAGES.fields)
    + [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("priority", IntegerType()),
        StructField("seq", LongType()),
    ]
)


def fetch_images_stage(
    batch: DataFrame,
    fetcher,
    robots: dict | None = None,
    respect_delay: bool = False,
    n_partitions: int | None = None,
    concurrency: int = 1,
) -> DataFrame:
    """Fused fetch + decode + pHash for image rows (G5/G6): image bytes cross
    the Arrow boundary once. Undecodable/blocked/failed rows keep their
    (url, status) for frontier bookkeeping with NULL image fields."""
    from german_newspaper_crawler_spark.sources.fetch import (
        fetch_pandas_batch, stage_input,
    )

    robots = robots or {}
    src = stage_input(batch, n_partitions)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from german_newspaper_crawler_spark.functions.codec import decode_image
        from german_newspaper_crawler_spark.functions.phash import phash64

        last_fetch: dict[str, float] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            f = fetch_pandas_batch(pdf, fetcher, robots, respect_delay, last_fetch, concurrency)
            rows = []
            for r in f.itertuples(index=False):
                rgb = None
                data = bytes(r.content) if r.content is not None else None
                if data is not None:
                    try:
                        rgb = decode_image(data)
                    except (NotImplementedError, ValueError):
                        rgb = None
                if rgb is None:
                    rows.append(
                        (r.url, None, None, None, None, None, None,
                         r.url, r.status, r.priority, r.seq)
                    )
                else:
                    fmt = "png" if data[:4] == b"\x89PNG"[:4] else "jpeg"
                    rows.append(
                        (
                            r.url, data, int(rgb.shape[1]), int(rgb.shape[0]), fmt,
                            r.anchor_text or "", phash64(rgb),
                            r.url, r.status, r.priority, r.seq,
                        )
                    )
            yield pd.DataFrame(rows, columns=[f_.name for f_ in _IMAGE_OUT.fields])

    return src.mapInPandas(run, schema=_IMAGE_OUT)


# --- enrichment (X4 whitespace-fallback tagger — pure SQL, no UDF) ------------

def enrich_pos_tags(df: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """pos_tag_object semantics (pos_tagging.py:169-227) with the spaCy-less
    whitespace fallback (pos_tagging.py:108-116): tokens (i, w, '', '', ''),
    cap at MAX_POS_TAG_ENTRIES; skipped entirely (→ []) for binary urls, PDF
    magic, empty text, or token estimate over MAX_POS_TAG_TOKENS."""
    from german_newspaper_crawler_spark.functions.text import token_count_estimate
    from german_newspaper_crawler_spark.functions.urls import is_binary_url

    est = token_count_estimate("text")
    pdf_like = (
        F.coalesce(F.col("is_pdf_like"), F.lit(False))
        if "is_pdf_like" in df.columns
        else F.ltrim(F.coalesce(F.col("html"), F.lit(""))).startswith("%PDF")
    )
    skip = (
        is_binary_url("url")
        | pdf_like
        | (F.coalesce(F.col("text"), F.lit("")) == "")
        | (est > cfg.pos_tag_skip)
    )
    tags = F.expr(
        f"""transform(
              slice(split(trim(text), '\\\\s+'), 1, {cfg.pos_tag_cap}),
              (w, i) -> struct(cast(i as int) as tid, w as token,
                               '' as lemma, '' as tag, '' as pos))"""
    )
    return df.withColumn(
        "pos_taggs",
        F.when(skip, F.array().cast(ArrayType(schemas.POS_TAG))).otherwise(tags),
    )


# --- seen-set + articles commit -------------------------------------------------

def article_identity(df: DataFrame) -> DataFrame:
    """content_hash per §1.4: url-hash wins for http(s) urls, stripped
    text/html hash otherwise (object_model.py:195-214).

    The fused fetch+parse stage already computes the hashes python-side over
    the raw strings (bit-identical to sha2) — this is then a no-op; the JVM
    path remains for callers holding raw html columns."""
    if "content_hash" in df.columns:
        return df
    return df.withColumn(
        "content_hash", hashing.content_hash("url", "text", "html")
    ).withColumn("url_hash", hashing.url_hash("url")).withColumn(
        "text_content_hash", hashing.text_hash("text", "html")
    )


def skip_known(
    articles: DataFrame,
    seen: DataFrame,
    blooms: DataFrame | None = None,
    n_bloom_buckets: int = 16,
    scope_col: str | None = None,
) -> DataFrame:
    """The three-variant known-hash skip (web_requests.py:182-193): drop the
    row if content_hash OR url_hash OR text-content-hash is known.

    ``scope_col`` (U2 strict mode, web_requests.py:222-229): when set
    (e.g. ``"domain"``), a hash only skips rows of the SAME scope value —
    reproducing the reference's per-collection known_hashes replacement,
    where a cross-domain duplicate is re-processed.

    NOTE: ``articles`` feeds TWO plan branches (the narrow probe and the
    payload join-back), so an un-cached input recomputes its lineage twice —
    callers cache the fetched batch first (run_crawl does; it is bounded by
    the round's pop budget).

    With ``blooms`` (G1 accelerator): rows whose three hash variants are all
    provably-absent from the per-bucket Bloom filters bypass the exact
    anti-joins entirely — at 10^10 frontier scale that is the overwhelmingly
    common fresh-URL path, turning three shuffle anti-joins into a broadcast
    blob test. Maybe-seen rows fall through to the exact check, so the final
    set is always exact (the filter accelerates, never decides).

    Residual-scan note (10^10 seen): the exact fallback still scans the seen
    table's hash column (Spark's DPP does not prune the build side of a
    LEFT ANTI — verified). If that column scan ever dominates, partition the
    seen table by ``pmod(hash64(content_hash), K)`` (store.set_partition_spec)
    and statically prune the read to the maybe-rows' buckets — the bucket-id
    set is bounded by the constant K, so collecting it is bounded driver
    state like ids.py's per-partition counts. Not wired here because the
    bloom already shrinks the probe side to near-zero and the build-side
    scan is one columnar column.
    """
    if blooms is not None:
        from german_newspaper_crawler_spark.functions.hashing import hash64
        from german_newspaper_crawler_spark.operators.bloom import bloom_prefilter

        flagged = articles.withColumn("__maybe", F.lit(False))
        for c in ["content_hash", "url_hash", "text_content_hash"]:
            # bucket is a pure function of the probed digest (blooms are
            # built the same way: hash-bucketed, uniform by construction)
            probe = flagged.withColumn("__h", F.coalesce(F.col(c), F.lit("0" * 30)))
            probed = bloom_prefilter(
                probe, blooms, "__h",
                F.pmod(hash64(F.col("__h")), F.lit(n_bloom_buckets)).cast("int"),
            )
            flagged = probed.withColumn(
                "__maybe", F.col("__maybe") | F.col("maybe_seen")
            ).drop("maybe_seen", "__h")
        fresh = flagged.where(~F.col("__maybe")).drop("__maybe")
        maybe = flagged.where(F.col("__maybe")).drop("__maybe")
        # bloom "provably absent" is global, hence absent in every scope —
        # conservative under strict mode too
        return fresh.unionByName(skip_known(maybe, seen, scope_col=scope_col))

    sel = [F.col("content_hash").alias("h")]
    if scope_col:
        sel.append(F.col(scope_col).alias("__scope"))
    seen_h = seen.select(*sel).distinct()

    # Narrow-probe, join-back-once. The drop decision is a pure function of
    # the (content_hash, url_hash, text_content_hash[, scope]) tuple, so:
    # (1) unpivot just those columns to (tuple, h) rows and ONE semi-join
    # against seen — only ~100-byte keys shuffle; (2) anti-join the fat
    # article rows (html_gz + text + figures) against the matched-tuple set,
    # null-safe on every key. The hit set is tiny in steady state (popped
    # urls already anti-joined the frontier's seen) — AQE broadcasts it and
    # the payload never shuffles at all; worst case (refresh re-crawl) it is
    # bounded by the round's pop budget and the payload shuffles ONCE
    # instead of three times. A chained per-column anti-join would exchange
    # + sort the full payload on three different keys (measured plan: 3×
    # SortMergeJoin LeftAnti, each with its own fat-row Exchange).
    key_cols = ["content_hash", "url_hash", "text_content_hash"]
    if scope_col:
        key_cols.append(scope_col)
    probe = articles.select(*key_cols).select(
        *key_cols,
        F.explode(
            F.array("content_hash", "url_hash", "text_content_hash")
        ).alias("__h"),
    )
    cond = probe["__h"] == seen_h["h"]
    if scope_col:
        cond = cond & (probe[scope_col] == seen_h["__scope"])
    hits = probe.join(seen_h, cond, "left_semi").select(*key_cols).distinct()
    back = [articles[c].eqNullSafe(hits[c]) for c in key_cols]
    return articles.join(hits, reduce(and_, back), "left_anti")


def prefilter_known_urls(
    batch: DataFrame,
    seen: DataFrame,
    scope_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Pre-FETCH url-hash skip — the split form of skip_known's url_hash /
    content_hash variants, applied to the pop batch BEFORE the fetch stage.

    For http(s) rows ``content_hash == url_hash == sha256(url)``
    (article_identity, §1.4), so a seen url-hash decides two of the three
    skip variants from the url alone: the row is dropped here and the fetch
    never happens — at 10^10-frontier scale this is the difference between
    re-downloading every refresh-crawl page and touching only new content.
    Non-http rows have ``url_hash`` NULL under the reference rule and are
    never skipped here (their content_hash is the text hash — post-fetch).

    Combined with :func:`skip_known_text` the surviving set is EXACTLY
    skip_known's (tests/test_fetch_politeness.py asserts the equivalence):
    http rows probe {url_hash, url_hash, text_hash} there, {url_hash} here +
    {text_hash} after; non-http rows probe {text_hash, —, text_hash} there,
    {} here + {text_hash} after.

    Returns ``(fresh, skipped)`` — callers record ``skipped`` urls with
    status -304 so the frontier marks them resolved without a fetch.
    ``batch`` feeds both outputs; run_crawl's pop batch is already cached.
    """
    is_http = F.col("url").startswith("http://") | F.col("url").startswith(
        "https://"
    )
    sel = [F.col("content_hash").alias("h")]
    if scope_col:
        sel.append(F.col(scope_col).alias("__scope"))
    seen_h = seen.select(*sel).distinct()
    probe = batch.withColumn(
        "__uh", F.when(is_http, F.sha2(F.col("url"), 256))
    )
    cond = probe["__uh"] == seen_h["h"]
    if scope_col:
        cond = cond & (probe[scope_col] == seen_h["__scope"])
    skipped = probe.join(seen_h, cond, "left_semi").drop("__uh")
    fresh = probe.join(seen_h, cond, "left_anti").drop("__uh")
    return fresh, skipped


def skip_known_text(
    articles: DataFrame,
    seen: DataFrame,
    blooms: DataFrame | None = None,
    n_bloom_buckets: int = 16,
    scope_col: str | None = None,
) -> DataFrame:
    """Post-fetch text-hash skip — the other half of the split (see
    :func:`prefilter_known_urls`): ONE left-anti equi-join on
    ``text_content_hash``, a single linear consumer of the fetched batch —
    no cache requirement and exactly one payload shuffle worst-case
    (AQE broadcasts the seen side when small).

    With ``blooms`` (G1), rows whose text hash is provably absent bypass
    the exact join entirely — the overwhelmingly common fresh path.
    """
    if blooms is not None:
        from german_newspaper_crawler_spark.functions.hashing import hash64
        from german_newspaper_crawler_spark.operators.bloom import bloom_prefilter

        probe = articles.withColumn(
            "__h", F.coalesce(F.col("text_content_hash"), F.lit("0" * 30))
        )
        probed = bloom_prefilter(
            probe, blooms, "__h",
            F.pmod(hash64(F.col("__h")), F.lit(n_bloom_buckets)).cast("int"),
        )
        fresh = probed.where(~F.col("maybe_seen")).drop("maybe_seen", "__h")
        maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen", "__h")
        return fresh.unionByName(skip_known_text(maybe, seen, scope_col=scope_col))

    sel = [F.col("content_hash").alias("h")]
    if scope_col:
        sel.append(F.col(scope_col).alias("__scope"))
    seen_h = seen.select(*sel).distinct()
    cond = articles["text_content_hash"] == seen_h["h"]
    if scope_col:
        cond = cond & (articles[scope_col] == seen_h["__scope"])
    return articles.join(seen_h, cond, "left_anti")


# --- the driver loop -------------------------------------------------------------

def run_crawl(
    spark: SparkSession,
    store: SnapshotStore,
    seeds: DataFrame,
    fetcher: Fetcher,
    cfg: CrawlConfig | None = None,
    robots: dict | None = None,
    run_id: str = "run-0",
) -> dict:
    """Run crawl rounds until the frontier drains or max_rounds is hit.

    Uses the FUSED fetch+parse stages throughout (one Arrow crossing per
    payload). Resumable: all state (frontier/seen/articles/images) lives in
    the store; re-invoking continues from the last committed snapshots
    (G7/T2). Per-round counters go to the metrics list (lineage table analog).
    """
    cfg = cfg or CrawlConfig()
    metrics: list[dict] = []
    from german_newspaper_crawler_spark.observability import RunLogger

    runlog = RunLogger(store, run_id, now=cfg.parsed_ts)

    if not store.exists("frontier"):
        store.append("frontier", FR.frontier_from_seeds(seeds, cfg.n_buckets))
        runlog.info("driver", "frontier_seeded")
    elif cfg.reseed_listings:
        # recurring run: flip the seed listing rows back to pending via the
        # same keyed merge the state transitions use (write ∝ |seeds|)
        store.merge_delta(
            "frontier", FR.frontier_from_seeds(seeds, cfg.n_buckets), keys=["url"]
        )
        runlog.info("driver", "frontier_reseeded")
    if not store.exists("seen"):
        store.append("seen", spark.createDataFrame([], schemas.SEEN))

    total_fetched = total_articles = total_images = 0
    # A3 id high-water: read ONCE per run (on resume this is the only full
    # articles aggregation), then track in driver state — assign_ids hands
    # out dense ids, so highwater advances by exactly n_articles per round
    # (a per-round max() over a 10^10-row table would reopen every footer)
    id_highwater = 0
    if store.exists("articles"):
        id_highwater = store.read(spark, "articles").agg(F.max("_id")).first()[0] or 0
    for rnd in range(cfg.max_rounds):
        frontier = store.read(spark, "frontier")
        authority = None
        if cfg.authority_priority:
            # refresh link-authority ranks from the observed host graph on
            # the configured cadence (and on first use); host_rank commits
            # through the same keyed-delta path as every other table —
            # write ∝ ranked hosts, never a frontier-sized rewrite
            if (
                rnd % max(cfg.authority_refresh_every, 1) == 0
                or not store.exists("host_rank")
            ):
                ranks = FR.authority_from_frontier(
                    frontier, iterations=cfg.authority_iterations
                )
                if ranks is not None:
                    if store.exists("host_rank"):
                        store.merge_delta("host_rank", ranks, keys=["host"])
                    else:
                        store.append("host_rank", ranks)
                    runlog.info("driver", "host_rank_refreshed", round_no=rnd)
            if store.exists("host_rank"):
                authority = store.read(spark, "host_rank")
        batch = FR.pop_batch(
            frontier, cfg.per_host_budget,
            authority=authority, round_budget=cfg.round_budget,
        ).cache()
        if batch.isEmpty():
            batch.unpersist()
            break
        seen = store.read(spark, "seen", schemas.SEEN)

        # G2 at scale: robots state never touches the driver — the round's
        # hosts are TTL-checked as DataFrames, stale hosts go through a
        # distributed robots-fetch leg, and the rules come back onto the pop
        # batch via a broadcast join (VERDICT r1 #3).
        work = batch
        round_robots = robots
        if cfg.use_robots_table:
            from german_newspaper_crawler_spark.operators.robots import (
                attach_robots, refresh_robots_df,
            )

            rules = refresh_robots_df(
                spark, store, batch.select("host"), fetcher,
                now=cfg.parsed_ts or datetime.utcnow(),
                ttl_hours=cfg.robots_ttl_hours,
            )
            work = attach_robots(batch, rules)

        new_frontier: list[DataFrame] = []
        status_parts: list[DataFrame] = []  # (url, status) for state updates
        n_articles = n_images = 0
        round_ts = cfg.parsed_ts or datetime.utcnow()  # F10 injected clock

        # 1) listings → fused fetch+anchor-extract → frontier refill
        listings = work.where(F.col("kind") == "listing")
        if not listings.isEmpty():
            anchors = fetch_parse_listings_stage(
                listings, fetcher, robots=round_robots, respect_delay=cfg.respect_delay,
                concurrency=cfg.fetch_concurrency,
            ).cache()
            status_parts.append(
                anchors.where(F.col("sel_rank") == -1).select("page_url", "status")
                .withColumnRenamed("page_url", "url")
            )
            refill = refill_from_anchors(
                anchors.where(F.col("sel_rank") >= 0), seen, rnd + 1, cfg,
                scope_col="domain" if cfg.strict_refresh_replace else None,
            )
            new_frontier.append(refill)

        # 2) articles → url-hash pre-skip → fused fetch+parse → identity →
        #    text-hash skip → enrich → merge. The known-skip is SPLIT
        #    (prefilter_known_urls + skip_known_text ≡ skip_known): known
        #    urls never reach the fetch stage (status -304, state
        #    "skipped"), and the post-fetch check is one linear anti-join —
        #    the fetched batch has a single consumer chain.
        art_batch = work.where(F.col("kind") == "article")
        if not art_batch.isEmpty():
            scope = "domain" if cfg.strict_refresh_replace else None
            art_fresh, art_skipped = prefilter_known_urls(
                art_batch, seen, scope_col=scope
            )
            parsed = article_identity(
                fetch_parse_articles_stage(
                    art_fresh, fetcher, robots=round_robots, respect_delay=cfg.respect_delay,
                    concurrency=cfg.fetch_concurrency,
                )
            ).cache()
            status_parts.append(parsed.select("url", "status"))
            status_parts.append(
                art_skipped.select("url", F.lit(-304).alias("status"))
            )
            blooms = None
            if cfg.use_bloom:
                from german_newspaper_crawler_spark.operators.bloom import (
                    ensure_blooms,
                )

                # persistent incremental maintenance: per-round cost ∝ new
                # hashes (delta blobs OR-merge), full seen rescans only on
                # amortized capacity doublings — never per round (G1)
                blooms = ensure_blooms(
                    spark, store, seen, n_buckets=cfg.bloom_buckets,
                    fpr=cfg.bloom_fpr,
                )
            # robots-blocked rows were never fetched → no article row;
            # failures (status 0/4xx/5xx) DO upsert with empty html
            # (web_requests.py:129-150)
            fresh = skip_known_text(
                parsed.where(F.col("status") != -403), seen,
                blooms=blooms, n_bloom_buckets=cfg.bloom_buckets,
                scope_col=scope,
            )
            if cfg.tagger is not None:
                from german_newspaper_crawler_spark.operators.enrichment import (
                    enrich_stage,
                )

                enriched = enrich_stage(
                    fresh, cfg.tagger, cap=cfg.pos_tag_cap,
                    skip_tokens=cfg.pos_tag_skip,
                )
            else:
                enriched = enrich_pos_tags(fresh, cfg)
            # post-tag re-check (web_requests.py:205-211) — whitespace tagger
            # never mutates content_hash; kept as the same anti-join for parity
            sel2 = [F.col("content_hash").alias("h")] + (
                [F.col("domain").alias("__scope")] if scope else []
            )
            seen_h2 = seen.select(*sel2).distinct()
            cond2 = enriched.content_hash == seen_h2["h"]
            if scope:
                cond2 = cond2 & (enriched.domain == seen_h2["__scope"])
            enriched = enriched.join(seen_h2, cond2, "left_anti")
            parsed_ts = cfg.parsed_ts or datetime.utcnow()
            from german_newspaper_crawler_spark.operators.ids import assign_ids

            final = enriched.withColumn(
                "parsed_date",
                F.when(F.col("text") != "", F.lit(parsed_ts)).otherwise(
                    F.lit(None).cast("timestamp")
                ),
            ).withColumn("ai_keywords", F.array().cast(ArrayType(StringType())))
            final = assign_ids(
                final, order_cols=["domain", "priority", "seq"],
                offset=id_highwater,
            )
            articles_out = final.select(
                "_id", "url", "titel", "teaser", "autor", "category",
                "published_date", "parsed_date", "html_gz", "text",
                "ai_keywords", "pos_taggs", "content_hash", "domain",
            ).cache()
            n_articles = articles_out.count()
            id_highwater += n_articles
            if n_articles:
                # keyed delta, not a full-table MERGE rewrite — same
                # merge-on-read resolution as the frontier (write ∝ batch;
                # at 10^10 articles a per-round rewrite is the whole table)
                store.merge_delta("articles", articles_out, keys=["content_hash"])
                new_seen = articles_out.select(
                    "content_hash", "domain",
                    F.lit(parsed_ts).alias("added_at"),
                ).where(F.col("content_hash").isNotNull())
                store.append("seen", new_seen)
                if cfg.use_bloom:
                    from german_newspaper_crawler_spark.operators.bloom import (
                        update_blooms,
                    )

                    update_blooms(
                        spark, store, new_seen, n_buckets=cfg.bloom_buckets,
                        fpr=cfg.bloom_fpr,
                    )
            # 3) figures → image frontier rows (resolved against article url)
            if cfg.extract_images:
                figs = (
                    parsed.where(F.col("status") == 200)
                    .select(
                        "url", "domain", "base_url", "priority", "seq",
                        F.explode_outer("figures").alias("fig"),
                    )
                    .where(F.col("fig").isNotNull())
                    .select(
                        "url", "domain", "base_url", "priority", "seq",
                        F.col("fig.src").alias("href"),
                        F.col("fig.caption").alias("anchor_text"),
                        F.col("priority").alias("sel_rank"),
                        F.col("seq").alias("doc_pos"),
                    )
                )
                from german_newspaper_crawler_spark.functions.urls import urljoin_batch

                @F.pandas_udf(StringType())
                def uj(bases: pd.Series, hrefs: pd.Series) -> pd.Series:
                    return urljoin_batch(bases, hrefs)

                figs = figs.withColumn("abs_url", uj(F.col("url"), F.col("href")))
                figs = FR.first_occurrence_dedup(figs)
                new_frontier.append(
                    FR.anchors_to_frontier(figs, rnd + 1, cfg.n_buckets, kind="image")
                )

        # 4) images → fused fetch+decode+phash → exact-phash dedup → append
        img_batch = work.where(F.col("kind") == "image")
        if not img_batch.isEmpty():
            img_out = fetch_images_stage(
                img_batch, fetcher, robots=round_robots, respect_delay=cfg.respect_delay,
                concurrency=cfg.fetch_concurrency,
            ).cache()
            status_parts.append(img_out.select("url", "status"))
            imgs = img_out.where(F.col("bytes").isNotNull()).select(
                *[f.name for f in schemas.IMAGES.fields], "priority", "seq"
            )
            if cfg.phash_max_hamming > 0:
                from german_newspaper_crawler_spark.operators.dedup import (
                    phash_suppress_near_dups,
                )

                seen_ph = None
                if store.exists("seen_phash"):
                    seen_ph = store.read(spark, "seen_phash")
                elif store.exists("images"):
                    # migrate an exact-dedup-era store: bootstrap the narrow
                    # side table from the accepted images' phashes once
                    seen_ph = store.read(spark, "images").select(
                        "phash", F.lit(round_ts).alias("added_at")
                    ).distinct()
                    store.append("seen_phash", seen_ph)
                imgs = phash_suppress_near_dups(
                    imgs, seen_ph, id_col="image_id", hash_col="phash",
                    order_cols=["priority", "seq"],
                    max_hamming=cfg.phash_max_hamming,
                ).select(*[f.name for f in schemas.IMAGES.fields])
            else:
                if store.exists("images"):
                    existing = store.read(spark, "images").select("phash").distinct()
                    imgs = imgs.join(existing, "phash", "left_anti")
                imgs = FR.first_occurrence_dedup(
                    imgs.withColumn("sel_rank", F.col("priority"))
                    .withColumn("doc_pos", F.col("seq")),
                    url_col="phash",
                ).select(*[f.name for f in schemas.IMAGES.fields])
            n_images = imgs.count()
            if n_images:
                store.append("images", imgs)
                if cfg.phash_max_hamming > 0:
                    store.append(
                        "seen_phash",
                        imgs.select(
                            "phash", F.lit(round_ts).alias("added_at")
                        ).distinct(),
                    )

        # 5) frontier state transitions + refill. State transitions go through
        # merge_delta (write ∝ popped-batch size, never a full-frontier
        # rewrite — VERDICT r1 #2); refill rows are new URLs, appended after
        # anti-joining the current frontier, so the store's append contract
        # (no key collisions with live deltas) holds by construction.
        n_fetched = 0
        if status_parts:
            statuses = status_parts[0]
            for s in status_parts[1:]:
                statuses = statuses.unionByName(s)
            n_fetched = statuses.count()
            done = (
                batch.drop("state")
                .join(statuses, "url")
                .select(
                    "url", "host", "bucket", "priority", "seq", "kind",
                    F.when(F.col("status") == 200, F.lit("fetched"))
                    .when(F.col("status") == -403, F.lit("blocked"))
                    .when(F.col("status") == -304, F.lit("skipped"))
                    .otherwise(F.lit("failed"))
                    .alias("state"),
                    F.lit(rnd).alias("round"),
                    "domain", "base_url", "anchor_text",
                    F.current_timestamp().alias("discovered_at"),
                )
            )
            store.merge_delta("frontier", done, keys=["url"])
            known_urls = frontier.select("url")
            for nf in new_frontier:
                fresh_rows = nf.join(known_urls, "url", "left_anti").cache()
                if not fresh_rows.isEmpty():
                    store.append("frontier", fresh_rows.select(
                        *[f.name for f in schemas.FRONTIER.fields]
                    ))
                    known_urls = known_urls.unionByName(fresh_rows.select("url"))
                fresh_rows.unpersist()
            if cfg.compact_every and (rnd + 1) % cfg.compact_every == 0:
                store.compact(spark, "frontier")
                if store.exists("articles"):
                    store.compact(spark, "articles")
                if cfg.expire_keep_last:
                    store.expire_snapshots("frontier", keep_last=cfg.expire_keep_last)
                    store.expire_snapshots("articles", keep_last=cfg.expire_keep_last)

        metrics.append(
            {
                "run_id": run_id, "round": rnd, "stage": "round",
                "n_fetched": n_fetched, "n_articles": n_articles,
                "n_images": n_images,
            }
        )
        # structured run log (logging.py analog): a few rows per round,
        # flushed as one small append — never per-URL
        runlog.info(
            "round", "round_complete", round_no=rnd,
            n_fetched=n_fetched, n_articles=n_articles, n_images=n_images,
        )
        if n_fetched and not n_articles and not n_images:
            runlog.warning("round", "no_yield_round", round_no=rnd,
                           n_fetched=n_fetched)
        runlog.flush(spark)
        total_fetched += n_fetched
        total_articles += n_articles
        total_images += n_images
        batch.unpersist()

    # G7: persist per-round lineage/metrics (per-partition fetch_ms detail
    # lives in the FETCHED.fetch_ms column; this is the run-level rollup)
    if metrics:
        rows = [
            (
                m["run_id"], m["round"], m["stage"], None, None,
                m["n_fetched"], m["n_articles"] + m["n_images"], 0, None,
            )
            for m in metrics
        ]
        store.append("metrics", spark.createDataFrame(rows, schemas.METRICS))
    runlog.info("driver", "run_complete", rounds=len(metrics),
                fetched=total_fetched, articles=total_articles,
                images=total_images)
    runlog.flush(spark)
    if cfg.log_keep_snapshots:
        runlog.rotate(keep_last=cfg.log_keep_snapshots)

    return {
        "rounds": len(metrics),
        "fetched": total_fetched,
        "articles": total_articles,
        "images": total_images,
        "metrics": metrics,
    }
