"""Executable model of the reference crawler's semantics (the parity golden).

The reference itself cannot run here (bs4 is not in the container), so this
module re-states its control flow line-by-line from /root/reference — every
branch cited — as a sequential pure-Python function over the same fixtures.
The Spark pipeline must reproduce this simulator's fetch order, seen set,
and extracted fields exactly (SURVEY §5.2 item 2).
"""

from __future__ import annotations

import hashlib
from datetime import datetime
from urllib.parse import urljoin

from german_newspaper_crawler_spark.parse.html import extract_anchors, parse_article

SKIP_EXTENSIONS = (".pdf", ".jpg", ".jpeg", ".png", ".gif", ".mp4", ".zip", ".gz")
MAX_POS_TAG_ENTRIES = 50_000
MAX_POS_TAG_TOKENS = 200_000


def sha256(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


def fetch_article_urls(base_url: str, html: str, known_hashes: set[str]) -> list[str]:
    """TAZ.fetch_article_urls (taz.py:159-255): ladder anchors → validity
    filter → urljoin → first-occurrence dedup → url-hash/anchor-text-hash
    skip, in exactly that per-anchor order."""
    urls: list[str] = []
    seen: set[str] = set()
    for href, anchor_text, _rank, _pos in extract_anchors(html or ""):
        if not isinstance(href, str):
            continue
        href = href.strip()  # taz.py:213
        if not href or href.startswith("javascript:") or href.startswith("mailto:") or href == "#":
            continue  # taz.py:214-215
        abs_url = urljoin(base_url, href)  # taz.py:216
        if abs_url in seen:  # taz.py:217-218
            continue
        skip = False
        if known_hashes and sha256(abs_url) in known_hashes:  # taz.py:222-229
            skip = True
        if not skip and anchor_text:  # taz.py:231-241
            if known_hashes and sha256(anchor_text.strip()) in known_hashes:
                skip = True
        if skip:
            continue
        seen.add(abs_url)  # taz.py:246-247
        urls.append(abs_url)
    return urls


def whitespace_pos_tags(url: str, html: str, text: str) -> list[tuple]:
    """pos_tag_object with the spaCy-less fallback (pos_tagging.py:169-227,
    108-116). Returns [] when any skip gate fires."""
    url_l = (url or "").lower()
    html = html or ""
    text = text or ""
    if any(url_l.endswith(e) for e in SKIP_EXTENSIONS) or (
        html and html.lstrip().startswith("%PDF")
    ):
        return []
    if not text:
        return []
    if len(text.split()) > MAX_POS_TAG_TOKENS:
        return []
    return [
        (i, w, "", "", "") for i, w in enumerate(text.split()) if i < MAX_POS_TAG_ENTRIES
    ]


def simulate_crawl(
    seeds: list[dict],
    pages: dict[str, tuple[int, str]],
    known_hashes: set[str] | None = None,
    parsed_ts: datetime | None = None,
):
    """main() + process_domain_generic (scr/german_newspaper_crawler.py:76-115,
    web_requests.py:68-229): per-domain sequential crawl with the three-variant
    hash skip, post-tag re-check, upsert, and the U2 refresh-replace quirk.

    Returns (records_in_upsert_order, final_known_set, fetch_order).
    """
    known: set[str] = set(known_hashes or set())
    records: list[dict] = []
    fetch_order: list[str] = []
    collections: dict[str, dict[str, dict]] = {}  # domain → {key → record}

    next_id = 0
    for seed in seeds:  # config order (scr:76)
        domain = seed["domain"]
        col = collections.setdefault(domain, {})
        status, listing_html = pages.get(seed["base_url"], (404, ""))
        listing_html = listing_html if status == 200 else ""
        urls = fetch_article_urls(seed["base_url"], listing_html, known)

        for url in urls:  # sequential loop (web_requests.py:127)
            fetch_order.append(url)
            status, html = pages.get(url, (404, ""))
            html = html if status == 200 else ""  # fetch failure → "" (:129-133)
            d = parse_article(url, html)
            text = d["text"] or ""

            # ObjectModel.__post_init__ (object_model.py:195-214): url-hash
            # wins for http(s) urls, else stripped text/html hash.
            if url.startswith(("http://", "https://")):
                content_hash = sha256(url)
            else:
                data0 = (text or html or "").strip()
                content_hash = sha256(data0) if data0 else None

            # process_domain_generic re-derivation + 3-variant skip (:152-196)
            url_hash = sha256(url) if url.startswith(("http://", "https://")) else None
            data = (text or html or "").strip()
            content_hash_calc = sha256(data) if data else None
            if content_hash and content_hash in known:
                continue
            if url_hash and url_hash in known:
                continue
            if content_hash_calc and content_hash_calc in known:
                continue

            pos = whitespace_pos_tags(url, html, text)

            if content_hash and content_hash in known:  # re-check (:205-211)
                continue

            next_id += 1
            rec = {
                "_id": next_id,
                "url": url,
                "titel": None,
                "teaser": d["teaser"],
                "autor": d["autor"],
                "category": d["category"],
                "published_date": d["published_date"],
                "parsed_date": parsed_ts if text else None,  # taz.py:355-360
                "html": html,
                "text": text,
                "ai_keywords": [],
                "pos_taggs": pos,
                "content_hash": content_hash,
                "domain": domain,
            }
            key = content_hash or url  # upsert key choice (mongodb.py:136-149)
            col[key] = rec
            records.append(rec)
            if content_hash:
                known.add(content_hash)  # web_requests.py:218-219

        # U2 refresh-replace quirk (scr:112-113, mongodb.py:68-80): the
        # global set becomes THIS collection's hashes only.
        known = {
            r["content_hash"] for r in col.values() if isinstance(r["content_hash"], str)
        }

    return records, known, fetch_order
