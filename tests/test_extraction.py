"""Hand-pinned extraction expectations (taz.py semantics) — these lock the
behavior independently of the simulator (which shares the implementation),
so parser internals (e.g. the C-accelerated fast path) can change safely.
"""

from __future__ import annotations

from german_newspaper_crawler_spark.parse.html import (
    extract_anchors, extract_body_text, extract_figures, extract_metadata,
)
from german_newspaper_crawler_spark.parse.minidom import parse_html

LISTING = """<html><body>
<a href="/plain1">Plain One</a>
<a class="headline-link x" href="/h1">Head 1</a>
<a class="teaser-link" href="/t1">Teaser 1</a>
<a href="/artikel/77">Art 77</a>
<a class="teaser-link" href="/t2">Teaser <b>2</b></a>
<a href="javascript:void(0)">junk</a>
<a href="https://abs.example/x">Abs</a>
<a class="other">no href</a>
</body></html>"""


def test_anchor_ladder_order_and_ranks():
    got = extract_anchors(LISTING)
    # rank 0: teaser-link in doc order; rank 1: headline-link; rank 3:
    # /artikel/ substr; rank 4: href^='/' (INCLUDING the teaser/headline dups
    # and junk with matching prefix); rank 5: http prefix
    flat = [(h, t, r) for h, t, r, _ in got]
    assert flat[0] == ("/t1", "Teaser 1", 0)
    assert flat[1] == ("/t2", "Teaser 2", 0)  # get_text(" ", strip) over <b>
    assert flat[2] == ("/h1", "Head 1", 1)
    assert flat[3] == ("/artikel/77", "Art 77", 3)
    # rank 4 re-lists every /-prefixed href in doc order (dedup happens later)
    rank4 = [h for h, t, r in flat if r == 4]
    assert rank4 == ["/plain1", "/h1", "/t1", "/artikel/77", "/t2"]
    assert [h for h, t, r in flat if r == 5] == ["https://abs.example/x"]
    # javascript: href only matches no ladder rank (filtered later anyway)
    assert all(h != "javascript:void(0)" for h, _, _ in flat)


def test_anchor_fallback_all_a():
    got = extract_anchors('<p><a name="x">t</a><a href="ftp://f/x">F</a></p>')
    assert got == [("ftp://f/x", "F", 6, 3)]


def test_metadata_variants():
    html = """<html><head>
    <meta property="article:published_time" content="2024-02-03T08:30:00">
    <meta name="author" content="Meta Author">
    <meta name="description" content="Meta Desc">
    </head><body>
    <time datetime="2024-01-05T10:00:00">fünfter</time>
    <div class="typo-name-detail pr-xsmall author-name-wrapper">
      <a class="teaser-link" href="/a"><span class="typo-name-detail-bold">
      Ana  Bold</span></a></div>
    <h2><span class="headline typo-r-topline-detail">!</span>
        <span class="typo-r-head-detail">Politik  X</span></h2>
    <p class="intro typo-r-subline-detail"> Teaser   hier. </p>
    </body></html>"""
    pub, author, cat, teaser = extract_metadata(parse_html(html))
    assert pub == "2024-01-05T10:00:00"  # <time> wins over meta
    assert author == "Ana Bold"  # wrapper wins over meta; ws-normalized
    assert cat == "Politik X"  # h2-parent head-detail span
    assert teaser == "Teaser hier."


def test_metadata_fallbacks():
    html = """<html><head>
    <meta property="article:published_time" content="2024-02-03T08:30:00">
    <meta name="author" content="Meta Author">
    <meta name="description" content="Meta Desc">
    </head><body>
    <div><span class="headline typo-r-topline-detail">Sport 3</span></div>
    </body></html>"""
    pub, author, cat, teaser = extract_metadata(parse_html(html))
    assert pub == "2024-02-03T08:30:00"
    assert author == "Meta Author"
    assert cat == "Sport 3"  # marker's own text (last category fallback)
    assert teaser == "Meta Desc"


def test_body_ladder_and_fallback():
    html = """<div class="article__body"><p> A  1 </p><p></p><p>B</p></div>
    <article><p>IGNORED</p></article>"""
    assert extract_body_text(parse_html(html)) == "A 1\n\nB"
    # first ladder hit wins even when a later candidate also matches
    html2 = "<article><p>Art body</p></article><div id='content'><p>C</p></div>"
    assert extract_body_text(parse_html(html2)) == "C"  # div#content before article
    # fallback: all <p> when no container matches
    assert extract_body_text(parse_html("<p>x</p><span><p>y</p></span>")) == "x\n\ny"


def test_figures():
    html = """<figure><img src="/i1.png" alt="Alt1"><figcaption> Cap  1 </figcaption></figure>
    <figure><img src="/i2.png" alt="Alt2"></figure>
    <figure><img alt="nosrc"></figure>
    <figure><figcaption>noimg</figcaption></figure>"""
    assert extract_figures(parse_html(html)) == [("/i1.png", "Cap 1"), ("/i2.png", "Alt2")]


def test_fast_path_equivalent_to_tolerant_parser():
    """The expat fast path must extract identically to the tolerant
    html.parser path on every fixture page (it falls back on any parse
    error, so equivalence-on-success is the full contract)."""
    import german_newspaper_crawler_spark.parse.html as H
    from german_newspaper_crawler_spark.fixtures import make_fixtures
    from german_newspaper_crawler_spark.parse import minidom

    seeds, pages, blobs, _ = make_fixtures(n_hosts=2, articles_per_host=6)
    for _, html in pages.values():
        fast = minidom.parse_html(html)
        slow = minidom.parse_html_slow(html)
        assert extract_metadata(fast) == extract_metadata(slow)
        assert extract_body_text(fast) == extract_body_text(slow)
        assert extract_figures(fast) == extract_figures(slow)
    # messy markup must fall back, not crash
    messy = "<p>unclosed <a href='/x'>link <div>nested wrong</p>"
    got = H.extract_anchors(messy)
    assert got and got[0][0] == "/x"
