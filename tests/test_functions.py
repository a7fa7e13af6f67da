"""Unit tests for the scalar function layer (SURVEY.md §2.8).

The hash-identity tests are the load-bearing ones: the engine's whole dedup
semantics hang on ``sha2(x,256) == hashlib.sha256(x).hexdigest()``.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from german_newspaper_crawler_spark.functions import hashing, text, urls


URLS = [
    "https://taz.de/artikel/1",
    "http://example.com/a?b=c",
    "https://taz.de/übermorgen/ärger-ß",  # non-ascii → utf-8 byte identity
    "ftp://not-http.example/x",
    "artikel/relative",
    "",
]


def test_sha256_hex_matches_hashlib(spark):
    df = spark.createDataFrame([(u,) for u in URLS if u], ["url"])
    got = {
        r["url"]: r["h"]
        for r in df.select("url", hashing.sha256_hex("url").alias("h")).collect()
    }
    for u in URLS:
        if u:
            assert got[u] == hashlib.sha256(u.encode("utf-8")).hexdigest()


def test_url_hash_http_only(spark):
    df = spark.createDataFrame([(u,) for u in URLS if u], ["url"])
    rows = df.select("url", hashing.url_hash("url").alias("h")).collect()
    for r in rows:
        if r["url"].startswith(("http://", "https://")):
            assert r["h"] == hashlib.sha256(r["url"].encode()).hexdigest()
        else:
            assert r["h"] is None


def test_content_hash_precedence(spark):
    # url-hash wins for valid http(s) url; text-hash fallback for urlless rows;
    # text preferred over html; stripped before hashing (object_model.py:195-214).
    rows = [
        Row(url="https://a.de/x", text="body", html="<p>body</p>"),
        Row(url="relative/x", text="  body text  ", html="<p>h</p>"),
        Row(url=None, text="", html=" <p>h</p> "),
        Row(url=None, text=None, html=None),
    ]
    df = spark.createDataFrame(rows)
    got = [
        r["ch"]
        for r in df.select(
            hashing.content_hash("url", "text", "html").alias("ch")
        ).collect()
    ]
    assert got[0] == hashlib.sha256(b"https://a.de/x").hexdigest()
    assert got[1] == hashlib.sha256(b"body text").hexdigest()
    assert got[2] == hashlib.sha256(b"<p>h</p>").hexdigest()
    assert got[3] is None


def test_hash64_matches_duckdb(spark):
    import duckdb

    vals = ["abc", "täz-ß", "shingle one two", ""]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    got = dict(
        (r["v"], r["h"])
        for r in df.select(
            "v", hashing.hash64("v", seed="7").alias("h")
        ).collect()
    )
    con = duckdb.connect()
    for v in vals:
        expect = con.sql(
            f"select {hashing.hash64_sql('?', seed='7')}", params=[v]
        ).fetchone()[0]
        assert got[v] == expect, v


def test_href_valid(spark):
    cases = {
        "/artikel/1": True,
        " https://x.de ": True,
        "javascript:void(0)": False,
        "mailto:x@y.z": False,
        "#": False,
        "": False,
        "#frag": True,  # reference only drops the bare "#" (taz.py:215)
    }
    df = spark.createDataFrame([(k,) for k in cases], ["href"])
    got = {
        r["href"]: r["ok"]
        for r in df.select("href", urls.href_valid("href").alias("ok")).collect()
    }
    assert got == cases


def test_urljoin_canonicalize(spark):
    from urllib.parse import urljoin as py_urljoin

    base = "https://TAZ.de/section/page.html"
    hrefs = [
        "/artikel/1",
        "artikel/2#frag",
        "https://Other.DE:443/x?utm_source=t&keep=1",
        "../up/3",
        "mailto:x@y",  # non-http(s) after join → NULL
    ]
    df = spark.createDataFrame([(base, h) for h in hrefs], ["base", "href"])
    got = [
        r["u"]
        for r in df.select(
            urls.absolutize_udf("base", "href").alias("u")
        ).collect()
    ]
    assert got[0] == "https://taz.de/artikel/1"
    assert got[1] == "https://taz.de/section/artikel/2"  # fragment stripped
    assert got[2] == "https://other.de/x?keep=1"  # port+tracking stripped
    assert got[3] == py_urljoin(base, "../up/3").replace("TAZ.de", "taz.de")
    assert got[4] is None


def test_host_of_binary_url(spark):
    df = spark.createDataFrame(
        [("https://www.taz.de/a.JPG",), ("https://x.de/a.html",)], ["url"]
    )
    rows = df.select(
        urls.host_of("url").alias("h"), urls.is_binary_url("url").alias("b")
    ).collect()
    assert rows[0]["h"] == "www.taz.de" and rows[0]["b"] is True
    assert rows[1]["h"] == "x.de" and rows[1]["b"] is False


def test_text_functions(spark):
    df = spark.createDataFrame(
        [("<p>Hello  <b>World</b></p>\n\n  zweiter   Absatz ",)], ["t"]
    )
    r = df.select(
        text.ws_normalize(text.strip_html_tags("t")).alias("clean"),
        text.token_count_estimate("t").alias("n"),
        F.size(text.paragraph_split("t")).alias("paras"),
    ).collect()[0]
    assert r["clean"] == "Hello World zweiter Absatz"
    assert r["paras"] == 2
    assert r["n"] == 4  # == len(t.split()): <p>Hello <b>World</b></p> zweiter Absatz


def test_lenient_timestamp(spark):
    df = spark.createDataFrame(
        [("2024-01-02 10:00:00",), ("junk",), ("2024-01-02T10:00:00",)], ["s"]
    )
    got = [r["t"] for r in df.select(text.lenient_iso_timestamp("s").alias("t")).collect()]
    assert got[0] is not None and got[2] is not None and got[1] is None


def test_langid_quality(spark):
    de = "Der Hund ist nicht mit der Katze und das ist ein Problem ."
    en = "The cat is not in the house and that is the point ."
    df = spark.createDataFrame([(de,), (en,), ("xyzzy 123",)], ["t"])
    rows = df.select(
        text.langid("t").alias("lang"), text.quality_score("t").alias("q")
    ).collect()
    assert rows[0]["lang"] == "de"
    assert rows[1]["lang"] == "en"
    assert rows[2]["lang"] == "unk"
    assert rows[0]["q"] == pytest.approx(1.0)
