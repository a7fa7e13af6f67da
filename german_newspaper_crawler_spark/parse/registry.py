"""Per-domain parser registry (X1) + flexible result coercion (X3).

Reference: domain modules are imported by name and expose
``parse_article(url, html)`` with flexible return types — ObjectModel, dict,
or raw text — coerced at the boundary (``lib/common/web_requests.py:23-30,
246-305``; module loading ``:267-281``). Here the registry maps
``domain → parse_fn``; the fused fetch+parse stage dispatches per row by the
frontier's domain column (the closure ships to executors with the job, the
``--py-files`` analog of the reference's importlib loading).

Coercion (X3, exactly ``_coerce_to_objectmodel``):
  dict  → taken as the article fields (missing keys → None),
  str   → treated as raw html: text = regex-stripped html (P6 degenerate parse),
  None  → minimal article from the fetched html,
  full dict from the default parser passes through untouched.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from german_newspaper_crawler_spark.parse.html import parse_article as _default_parse

ParseFn = Callable[[str, str], object]

_PARSERS: dict[str, ParseFn] = {}

_FIELDS = (
    "url", "titel", "teaser", "autor", "category",
    "published_date", "html", "text", "figures",
)


def register_parser(domain: str, fn: ParseFn) -> None:
    _PARSERS[domain] = fn


def get_parser(domain: str | None) -> ParseFn:
    """Domain parser or the default TAZ-style parser (the reference attaches
    the module's parse_article into the domain cfg, web_requests.py:273-281)."""
    return _PARSERS.get(domain or "", _default_parse)


def coerce_result(result: object, url: str, html: str) -> dict:
    """_coerce_to_objectmodel (web_requests.py:23-30) over plain dicts."""
    if isinstance(result, dict):
        out = {k: result.get(k) for k in _FIELDS}
        out["url"] = result.get("url", url)
        out["html"] = result.get("html", html)
        out["figures"] = result.get("figures") or []
        out["text"] = result.get("text")
        return out
    if isinstance(result, str):
        # raw-html return → degenerate strip parse (P6, web_requests.py:29)
        return coerce_result(
            {"url": url, "html": result, "text": re.sub(r"<[^>]+>", " ", result)},
            url, result,
        )
    # None / unknown → minimal article from the fetched html
    return coerce_result(
        {"url": url, "html": html, "text": re.sub(r"<[^>]+>", " ", html or "")},
        url, html,
    )


def parse_with_registry(domain: str | None, url: str, html: str) -> dict:
    fn = get_parser(domain)
    if fn is _default_parse:
        return _default_parse(url, html)  # already the full dict shape
    try:
        result = fn(url, html)
    except TypeError:
        result = fn(url)  # arity fallback (web_requests.py:136-143)
    except Exception:
        result = None  # log-and-continue wall (web_requests.py:139-143)
    return coerce_result(result, url, html)
