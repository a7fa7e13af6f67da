"""Text scalar functions + training-data text analysis.

Upper block: 1:1 JVM-side equivalents of the reference's scalar functions
(SURVEY.md §2.8). Lower block: graft text-analysis operators for a
training-data pipeline (language-ID heuristic, quality scoring, token
counting, fingerprinting) — all pure ``pyspark.sql.functions`` compositions,
SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# --- reference scalar functions (§2.8) -----------------------------------

def strip_html_tags(col) -> Column:
    """F2 — degenerate HTML→text: ``re.sub(r"<[^>]+>", " ", html)``
    (reference ``web_requests.py:29``)."""
    return F.regexp_replace(_c(col), "<[^>]+>", " ")


def ws_normalize(col) -> Column:
    """F3 — ``" ".join(txt.split())`` (reference ``taz.py:66`` et al.):
    collapse all whitespace runs to single spaces and trim."""
    return F.trim(F.regexp_replace(_c(col), r"\s+", " "))


def paragraph_split(col) -> Column:
    """F4 — ``re.split(r"\\n{2,}", text)`` (reference ``pos_tagging.py:56``)."""
    return F.split(_c(col), r"\n{2,}")


def token_count_estimate(col) -> Column:
    """A5 — whitespace token count ``len(text.split())``
    (reference ``pos_tagging.py:84-94``); 0 for empty/blank text."""
    t = F.trim(_c(col))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


def lenient_iso_timestamp(col) -> Column:
    """F8 — ``datetime.fromisoformat`` with null-on-failure
    (reference ``object_model.py:282-296``): ``try_to_timestamp``."""
    return F.try_to_timestamp(_c(col))


# --- graft text analysis --------------------------------------------------

# Tiny high-frequency stopword lists for the n-gram/stopword language
# heuristic. Counts of whole-word occurrences; deliberately small and fixed
# so the oracle SQL can repeat them verbatim.
DE_STOPWORDS = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"]
EN_STOPWORDS = ["the", "and", "is", "not", "of", "to", "in", "that"]


def _stopword_hits(col, words: list[str]) -> Column:
    pat = "(?i)\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(_c(col), F.lit(pat), F.lit(1)))


def langid_scores(col) -> tuple[Column, Column]:
    """Whole-word stopword hit counts for (de, en)."""
    return _stopword_hits(col, DE_STOPWORDS), _stopword_hits(col, EN_STOPWORDS)


def langid(col) -> Column:
    """Heuristic language ID: de/en by stopword hits, 'unk' on tie/zero."""
    de, en = langid_scores(col)
    return (
        F.when(de > en, F.lit("de"))
        .when(en > de, F.lit("en"))
        .otherwise(F.lit("unk"))
    )


def punct_ratio(col) -> Column:
    """Punctuation chars / total chars (0 for empty)."""
    t = _c(col)
    n = F.length(t)
    p = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p.cast("double") / n.cast("double"))


def stopword_ratio(col) -> Column:
    """Stopword tokens (de+en lists) / total tokens (0 for empty)."""
    de, en = langid_scores(col)
    n = token_count_estimate(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(
        (de + en).cast("double") / n.cast("double")
    )


def quality_score(col) -> Column:
    """Composite [0,1] quality score: length band + punctuation sanity +
    stopword presence. Deterministic, SQL-expressible; mirrors the common
    C4/Gopher-style rule shape (length, symbol ratio, stopword evidence)."""
    n_tok = token_count_estimate(col)
    len_ok = F.when((n_tok >= 10) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.when(punct_ratio(col) <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    stop_ok = F.when(stopword_ratio(col) >= 0.05, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + punct_ok + stop_ok) / F.lit(3.0)


def chunk_text_by_paragraphs(text: str, max_len: int) -> list[str]:
    """O3 — greedy paragraph packing into <= max_len chunks; over-long
    paragraphs sliced (reference _chunk_text_by_paragraphs,
    pos_tagging.py:49-81, reproduced branch-for-branch). Pure-python helper
    for enrichment UDFs that feed models with bounded inputs (R5 bounded-
    memory pipelining); not a relational op."""
    import re as _re

    if not text:
        return []
    paras = _re.split(r"\n{2,}", text)
    chunks: list[str] = []
    current = ""
    for p in paras:
        p = p.strip()
        if not p:
            continue
        if len(p) > max_len:
            if current:
                chunks.append(current)
                current = ""
            for i in range(0, len(p), max_len):
                part = p[i : i + max_len]
                if part:
                    chunks.append(part)
            continue
        if not current:
            current = p
        elif len(current) + 2 + len(p) <= max_len:
            current = current + "\n\n" + p
        else:
            chunks.append(current)
            current = p
    if current:
        chunks.append(current)
    return chunks


# PII patterns — the C4-style scrub pass. Kept to a regex subset that means
# the same thing in Java regex (Spark) and RE2 (DuckDB) so the redaction is
# oracle-checkable: no backrefs, no lookarounds.
PII_PATTERNS = {
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "IPV4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "PHONE": r"\+\d{2}[ -]?\d{2,4}[ -]?\d{4,8}",
}


def redact_pii(col) -> Column:
    """Replace emails / IPv4s / international phone numbers with typed
    placeholders (``<EMAIL>`` …) — the standard pre-training scrub. Chained
    JVM-side regexp_replace, no UDF; patterns are dialect-portable so the
    DuckDB oracle applies the identical rules."""
    out = _c(col)
    for tag, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{tag}>")
    return out
