"""Reference-faithful HTML extraction (anchors, metadata, body, figures).

Reproduces the BeautifulSoup-based extraction of ``lib/domain/taz.py`` on the
in-repo mini-DOM, with each quirk preserved and cited. These functions are
per-document pure Python invoked from Arrow batches inside ``mapInPandas`` —
the distributed analog of the reference calling soup methods per page.

CSS-class semantics note: the selector ladder (``a.teaser-link``) matches a
whole class *token*; the metadata lambdas (taz.py:54-63) match a *substring*
of the raw class attribute. Both are reproduced distinctly.
"""

from __future__ import annotations

from datetime import datetime

from german_newspaper_crawler_spark.parse.minidom import Node, parse_html


def _cls_token(n: Node, token: str) -> bool:
    # n.get, not n.attrs.get — the ENode.attrs property builds a fresh dict
    # per access, and this runs ~10x per document in the hot loops
    c = n.get("class")
    return bool(c) and token in c.split()


def _ws(t: str) -> str:
    return " ".join(t.split())


# --- anchor ladder (taz.py:188-206) ---------------------------------------

def extract_anchors(html: str) -> list[tuple[str, str, int, int]]:
    """All candidate anchors as (href, anchor_text, sel_rank, doc_pos).

    The reference appends matches selector-by-selector (duplicates across
    selectors included) and dedups later by first occurrence of the absolute
    URL (taz.py:217-218) — so the raw list with (sel_rank, doc_pos) IS the
    ordering truth. Fallback to all <a href> only when the ladder matched
    nothing (taz.py:204-206).
    """
    root = parse_html(html)
    all_a = root.find_all("a")
    selectors = [
        lambda a: _cls_token(a, "teaser-link"),
        lambda a: _cls_token(a, "headline-link"),
        lambda a: _cls_token(a, "article__link"),
        lambda a: "/artikel/" in (a.get("href") or ""),
        lambda a: (a.get("href") or "").startswith("/"),
        lambda a: (a.get("href") or "").startswith("http"),
    ]
    out: list[tuple[str, str, int, int]] = []
    text_of: dict[int, str] = {}  # an anchor can match several rungs

    def _text(a: Node) -> str:
        t = text_of.get(a.pos)
        if t is None:
            t = text_of[a.pos] = a.get_text(" ", strip=True) or ""
        return t

    for rank, sel in enumerate(selectors):
        for a in all_a:
            href = a.get("href")
            if href and sel(a):
                out.append((href, _text(a), rank, a.pos))
    if not out:
        for a in all_a:
            href = a.get("href")  # attr probe, not the attrs dict build
            if href is not None:
                out.append((href, _text(a), 6, a.pos))
    return out


# --- metadata (taz.py:19-141) ----------------------------------------------

_UNSET = object()


def _meta_fallbacks(root: Node):
    """ONE pass over <meta> tags collecting the content of the FIRST element
    matching each fallback key — identical to four separate ``find`` calls
    (each returns the first match in document order and reads ITS content,
    present or not) but one C-filtered document scan instead of four.
    Returns sentinel-marked slots: ``_UNSET`` = no such element existed."""
    pub_prop = pubdate = author = desc = _UNSET
    for m in root.find_all("meta"):
        name = m.get("name")
        if pub_prop is _UNSET and m.get("property") == "article:published_time":
            pub_prop = m.get("content")
        if pubdate is _UNSET and name == "pubdate":
            pubdate = m.get("content")
        if author is _UNSET and name == "author":
            author = m.get("content")
        if desc is _UNSET and name == "description":
            desc = m.get("content")
    return pub_prop, pubdate, author, desc


def extract_metadata(root: Node) -> tuple[str | None, str | None, str | None, str | None]:
    """(published_iso, author, category, teaser) with every fallback chain
    from _extract_meta_from_soup."""
    published_iso = author = category = teaser = None

    time_tag = root.find("time")
    if time_tag:
        dt = (time_tag.get("datetime") or "").strip()
        if dt:
            published_iso = dt

    wrapper = root.find("div", class_fragment="author-name-wrapper")
    if wrapper:
        a_tag = wrapper.find("a", class_fragment="teaser-link")
        if a_tag:
            span = a_tag.find("span", class_fragment="typo-name-detail-bold")
            if span:
                txt = span.get_text(" ", strip=True)
                if txt:
                    author = _ws(txt)

    marker = root.find(("span", "div"), class_fragment="typo-r-topline-detail")
    candidate = None
    if marker:
        h2 = marker.find_parent("h2")
        if h2:
            head = h2.find("span", class_fragment="typo-r-head-detail")
            if head:
                t = head.get_text(" ", strip=True)
                if t:
                    candidate = t
        if candidate is None:
            sib = marker.find_next_sibling("span", class_fragment="typo-r-head-detail")
            if sib:
                t = sib.get_text(" ", strip=True)
                if t:
                    candidate = t
        if candidate is None:
            t = marker.get_text(" ", strip=True)
            if t:
                candidate = t
    if candidate:
        category = _ws(candidate)

    p_tag = root.find("p", class_fragment="typo-r-subline-detail")
    if p_tag:
        t = p_tag.get_text(" ", strip=True)
        if t:
            teaser = _ws(t)

    if not published_iso or not author or not teaser:
        pub_prop, pubdate, m_author, m_desc = _meta_fallbacks(root)
        if not published_iso:
            # reference: find(property=...) or find(name=pubdate) — an
            # existing property-element wins even with empty content
            content = pub_prop if pub_prop is not _UNSET else (
                pubdate if pubdate is not _UNSET else None
            )
            if content:
                published_iso = content.strip()
        if not author and m_author is not _UNSET and m_author:
            author = m_author.strip()
        if not teaser and m_desc is not _UNSET and m_desc:
            teaser = m_desc.strip()

    return published_iso, author, category, teaser


# --- body text (taz.py:264-299) ---------------------------------------------

_BODY_CANDIDATES = [
    ("div", {"class_token": "article__body"}),
    ("div", {"class_token": "article__content"}),
    ("div", {"class_token": "lead-body"}),
    ("div", {"class_token": "article-content"}),
    ("section", {"class_token": "article-body"}),
    ("div", {"class_token": "story-body"}),
    ("div", {"id": "content"}),
    ("article", {}),
    ("div", {"class_token": "teaser-body"}),
]


# candidates bucketed by tag so the document scan is one dict probe per node
_BODY_BY_TAG: dict[str, list[tuple[int, dict]]] = {}
for _rank, (_tag, _spec) in enumerate(_BODY_CANDIDATES):
    _BODY_BY_TAG.setdefault(_tag, []).append((_rank, _spec))


def _paragraphs_of(container: Node) -> list[str]:
    out = []
    for p in container.find_all("p"):
        t = p.get_text(" ", strip=True)
        if t:
            out.append(_ws(t))
    return out


def extract_body_text(root: Node) -> str:
    """Ladder semantics (taz.py:264-299): first candidate, in ladder order,
    whose matched container (first in document order) yields non-empty
    paragraphs; else all <p> in the document. One scan per candidate TAG
    (3 tags — each a C-filtered subtree walk on the expat path) instead of
    one full-document rescan per ladder rung."""
    first_match: dict[int, Node] = {}
    for tag, specs in _BODY_BY_TAG.items():
        for n in root.find_all(tag):  # document order → first hit per rank
            for rank, spec in specs:
                if rank in first_match:
                    continue
                if "class_token" in spec and not _cls_token(n, spec["class_token"]):
                    continue
                if "id" in spec and n.attrs.get("id") != spec["id"]:
                    continue
                first_match[rank] = n
    for rank in sorted(first_match):
        paragraphs = _paragraphs_of(first_match[rank])
        if paragraphs:
            return "\n\n".join(paragraphs)
    return "\n\n".join(_paragraphs_of(root))


# --- figures (graft G5 — image+caption pairs; no reference analog;
# nearest replaced behavior: body <p> extraction taz.py:264-299) -------------

def extract_figures(root: Node) -> list[tuple[str, str]]:
    """(img_src, caption) per <figure><img src><figcaption> — caption from
    figcaption text (ws-normalized), falling back to the img alt attribute."""
    out = []
    for fig in root.find_all("figure"):
        img = fig.find("img")
        if img is None or not img.get("src"):
            continue
        cap_node = fig.find("figcaption")
        caption = _ws(cap_node.get_text(" ", strip=True)) if cap_node else ""
        if not caption:
            caption = _ws(img.get("alt") or "")
        out.append((img.get("src"), caption))
    return out


# --- full article parse (taz.py:302-365) -------------------------------------

def lenient_fromisoformat(s: str | None) -> datetime | None:
    """datetime.fromisoformat with warn-and-null semantics
    (object_model.py:282-296; taz.py:326-338)."""
    if not s:
        return None
    try:
        return datetime.fromisoformat(s)
    except (ValueError, TypeError):
        try:
            return datetime.fromisoformat(s.strip())
        except (ValueError, TypeError):
            return None


def parse_article(url: str, html: str) -> dict:
    """parse_article_to_object equivalent → plain dict of ARTICLES columns
    (titel always None — taz.py:346; parsed_date set by the pipeline when
    text is non-empty, with an injected clock for determinism)."""
    root = parse_html(html or "")
    published_iso, author, category, teaser = extract_metadata(root)
    body = extract_body_text(root)
    figures = extract_figures(root)
    return {
        "url": url,
        "titel": None,
        "teaser": teaser,
        "autor": author,
        "category": category,
        "published_date": lenient_fromisoformat(published_iso),
        "html": html,
        "text": body,
        "figures": figures,
    }
