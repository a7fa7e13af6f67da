"""Deterministic crawl fixtures (FIXTURES.md §2-§6).

Seeded, wall-clock-free generators for the seed list, listing/article HTML
(exercising every selector-ladder rank, metadata fallback chain, body
container, junk hrefs, duplicate hrefs, binary pages, and failures), and
image blobs (PNG + fake-jpeg, with planted exact- and near-duplicates).

Domain names are chosen to sort in config order so the engine's
``(domain, priority, seq)`` order key replays the reference's sequential
per-domain processing (scr/german_newspaper_crawler.py:76).
"""

from __future__ import annotations

import numpy as np

from german_newspaper_crawler_spark.functions.codec import encode_image


def make_image(seed: int, size: int = 64, noise: int = 0) -> np.ndarray:
    """Low-frequency deterministic RGB image (stable under pHash)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (8, 8, 3))
    k = size // 8
    if not noise:
        # exact uint8 equivalent of kron(base, ones(k,k,1)) — no float pass
        return base.astype(np.uint8).repeat(k, axis=0).repeat(k, axis=1)
    img = np.kron(base.astype(np.float64), np.ones((k, k, 1)))
    img = img + rng.integers(-noise, noise + 1, img.shape)
    return img.clip(0, 255).astype(np.uint8)


def _listing_html(host: str, n_articles: int) -> str:
    """Listing page exercising the full ladder (taz.py:188-206) + junk
    (taz.py:213-215) + cross-selector and same-href duplicates."""
    rows = []
    for i in range(n_articles):
        if i % 3 == 0:
            rows.append(f'<a class="teaser-link" href="/artikel/a{i}">Artikel {i} über ß</a>')
        elif i % 3 == 1:
            rows.append(f'<a class="headline-link" href="/artikel/a{i}">Schlagzeile {i}</a>')
        else:
            rows.append(f'<a class="article__link" href="https://{host}/artikel/a{i}">Beitrag {i}</a>')
    rows.insert(1, '<a href="javascript:void(0)">junk</a>')
    rows.insert(2, f'<a class="teaser-link" href="/artikel/a0">Artikel 0 nochmal</a>')  # dup href
    rows.append('<a href="mailto:red@ex.de">mail</a>')
    rows.append('<a href="#">top</a>')
    rows.append(f'<a href="/dossier/{host.split(".")[0]}">Dossier</a>')  # rank 4 only
    rows.append(f'<a href="http://extern.example/von-{host.split(".")[0]}">Extern</a>')  # rank 5
    rows.append(f'<a href="/static/broken{0}">Kaputt</a>')  # will 500
    rows.append(f'<a href="/files/report.pdf">Report PDF</a>')  # binary page
    return "<html><body>\n" + "\n".join(rows) + "\n</body></html>"


def _article_html(host: str, i: int, n_figs: int) -> str:
    """Article page cycling through every metadata fallback and body
    container variant (taz.py:19-141, 264-299)."""
    # published (3 variants incl. an unparseable datetime → published None)
    if i % 3 == 0:
        published = f'<time datetime="2024-01-{(i % 27) + 1:02d}T10:0{i % 6}:00">am Tag</time>'
    elif i % 3 == 1:
        published = f'<meta property="article:published_time" content="2024-02-{(i % 27) + 1:02d}T08:30:00">'
    else:
        published = '<time datetime="gestern um zehn">gestern</time>'
    # author (wrapper structure vs meta fallback)
    if i % 2 == 0:
        author = (
            '<div class="typo-name-detail pr-xsmall author-name-wrapper">'
            '<a class="teaser-link" href="/autor/x">'
            f'<span class="typo-name-detail-bold">Autorin {i} Müller</span></a></div>'
        )
    else:
        author = f'<meta name="author" content="Redaktion {i}">'
    # category (h2-parent / sibling / marker-text variants)
    if i % 3 == 0:
        category = (
            '<h2><span class="headline typo-r-topline-detail">!</span>'
            f'<span class="typo-r-head-detail">Politik {i % 4}</span></h2>'
        )
    elif i % 3 == 1:
        category = (
            '<div><span class="headline typo-r-topline-detail">~</span>'
            f'<span class="typo-r-head-detail">Kultur {i % 4}</span></div>'
        )
    else:
        category = f'<span class="headline typo-r-topline-detail">Sport {i % 4}</span>'
    # teaser
    if i % 2 == 0:
        teaser = f'<p class="intro typo-r-subline-detail">Teaser  {i}:  Ä-Umlaute   und ß.</p>'
    else:
        teaser = f'<meta name="description" content="Beschreibung {i} mit Ö.">'
    # figures
    figs = []
    for j in range(n_figs):
        cap = f'<figcaption>Bild {i}.{j} — Straße ß</figcaption>' if j % 2 == 0 else ""
        alt = f' alt="Alt-Text {i}.{j}"'
        figs.append(f'<figure><img src="/img/{i}_{j}.png"{alt}>{cap}</figure>')
    paras = "".join(
        f"<p>Absatz {i}.{k} der die das und nicht mit ein ist Text.</p>" for k in range(3)
    )
    body_variants = [
        f'<div class="article__body">{paras}{"".join(figs)}</div>',
        f'<div class="article__content">{paras}{"".join(figs)}</div>',
        f'<div id="content">{paras}{"".join(figs)}</div>',
        f'<article>{paras}{"".join(figs)}</article>',
        f"{paras}{''.join(figs)}",  # no container → all-<p> fallback
    ]
    body = body_variants[i % 5]
    return (
        "<html><head>" + (published if published.startswith("<meta") else "")
        + (author if author.startswith("<meta") else "")
        + (teaser if teaser.startswith("<meta") else "")
        + "</head><body>"
        + (published if not published.startswith("<meta") else "")
        + (author if not author.startswith("<meta") else "")
        + category
        + (teaser if not teaser.startswith("<meta") else "")
        + body
        + "</body></html>"
    )


def make_fixtures(
    n_hosts: int = 2, articles_per_host: int = 6, figs_per_article: int = 2, seed: int = 42
):
    """Returns (seeds, pages, blobs, image_truth).

    seeds: list of dicts (domain, base_url, host, collection) in config order
    pages: url -> (status, html)
    blobs: url -> encoded image bytes
    image_truth: url -> dict(rgb=np.ndarray, fmt, caption) for PSNR/caption
                 invariants
    """
    hosts = [f"h{k}-zeitung{k}.example" for k in range(n_hosts)]
    seeds = [
        {
            "domain": f"d{k}_paper{k}",  # sorts in config order
            "base_url": f"https://{hosts[k]}/",
            "host": hosts[k],
            "collection": f"col{k}",
        }
        for k in range(n_hosts)
    ]
    pages: dict[str, tuple[int, str]] = {}
    blobs: dict[str, bytes] = {}
    image_truth: dict[str, dict] = {}

    for k, host in enumerate(hosts):
        pages[f"https://{host}/"] = (200, _listing_html(host, articles_per_host))
        for i in range(articles_per_host):
            url = f"https://{host}/artikel/a{i}"
            if i == articles_per_host - 1:
                pages[url] = (500, "server error")  # failure → html="" semantics
            else:
                pages[url] = (200, _article_html(host, i, figs_per_article))
            for j in range(figs_per_article):
                img_url = f"https://{host}/img/{i}_{j}.png"
                if k == 0 and i == 2 and j == 1:
                    rgb = make_image(1000)  # exact duplicate of (0,0,0) image
                elif k == 0 and i == 4 and j == 1:
                    rgb = make_image(1000, noise=4)  # near-duplicate (phash-close)
                else:
                    rgb = make_image(1000 + k * 100 + i * 10 + j)
                fmt = "png" if (i + j) % 2 == 0 else "jpeg"
                data = encode_image(rgb, fmt)
                blobs[img_url] = data
                cap = f"Bild {i}.{j} — Straße ß" if j % 2 == 0 else f"Alt-Text {i}.{j}"
                image_truth[img_url] = {"rgb": rgb, "fmt": fmt, "caption": cap}
        pages[f"https://{host}/dossier/{host.split('.')[0]}"] = (
            200,
            f"<html><body><p>Dossier  {host}  der die und.</p></body></html>",
        )
        pages[f"https://{host}/static/broken0"] = (500, "oops")
        pages[f"https://{host}/files/report.pdf"] = (200, "%PDF-1.4 fake pdf bytes")
        pages[f"http://extern.example/von-{host.split('.')[0]}"] = (
            200,
            f"<html><body><p>Externe Seite für {host} und der das.</p></body></html>",
        )
    return seeds, pages, blobs, image_truth
