"""Legacy ingest normalization (operators/legacy.py): parity with the
reference's ObjectModel gauntlet + idempotence property."""

from __future__ import annotations

import importlib.util
import logging
import sys
import types

from hypothesis import given, settings
from hypothesis import strategies as st

from german_newspaper_crawler_spark.operators.legacy import (
    normalize_pos_taggs, normalize_record,
)


def _load_reference_object_model():
    stub = types.ModuleType("lib.common.logging")
    stub.get_logger = lambda name: logging.getLogger(f"refstub.{name}")
    sys.modules.setdefault("lib", types.ModuleType("lib"))
    sys.modules.setdefault("lib.common", types.ModuleType("lib.common"))
    sys.modules["lib.common.logging"] = stub
    spec = importlib.util.spec_from_file_location(
        "ref_object_model", "/root/reference/lib/common/object_model.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


DIRTY_POS_TAGGS = [
    None,
    {},
    {"Haus": "NN", "läuft": "VVFIN"},
    [[2, "c", "lc", "gc", "pc"], [0, "a", "la", "ga", "pa"], [1, "b", None, "gb", "pb"]],
    [["a", "la", "ga", "pa"], ["b", "lb", "gb", "pb"]],
    ["nur", "worte", "hier"],
    [{"id": 5, "wort": "W", "lemma": "w", "tags": "T", "pos": "P"},
     {"tid": 1, "text": "X", "tag": "t2"},
     {"token": "Y"}],
    [["zu", "kurz"]],  # odd length → flatten + pad
    [["a", "b", "c", "d", "e", "f"]],  # over-long → first 4 after flatten
    [[None, None, None, None, None]],  # 5-seq with null tid → fallback id
    [7, 3.5, True],  # scalars stringified
]


def test_normalize_pos_taggs_matches_reference():
    ref = _load_reference_object_model()
    for dirty in DIRTY_POS_TAGGS:
        expected = ref.ObjectModel._normalize_pos_taggs(dirty)
        got = normalize_pos_taggs(dirty)
        assert got == expected, dirty


def test_normalize_record_matches_reference_from_dict():
    """from_dict coercions (object_model.py:290-356): legacy ai_summary,
    scalar ai_keywords, url-from-id recovery, date parse, hash fallback."""
    ref = _load_reference_object_model()
    records = [
        {"_id": 3, "url": "https://x.de/a", "text": "hallo welt",
         "published_date": "2024-05-06T07:08:09", "ai_keywords": ["a", "b"],
         "pos_taggs": [["w", "l", "g", "p"]], "titel": "T"},
        {"url": "https://x.de/b", "ai_summary": "altes resumee",
         "published_date": "kaputt", "pos_taggs": None},
        {"id": "https://x.de/c", "pos_taggs": {"tok": "NN"}},  # url from id
        {"id": "12345", "text": "  inhalt hier  ", "ai_keywords": "solo"},
        {"url": "ftp://weird/x", "html": "<p>nur html</p>"},
    ]
    for data in records:
        obj = ref.ObjectModel.from_dict(dict(data))
        got = normalize_record(dict(data))
        assert got["url"] == obj.url
        assert got["ai_keywords"] == obj.ai_keywords
        assert [tuple(t.values()) for t in got["pos_taggs"]] == [
            tuple(e) for e in obj.pos_taggs
        ]
        assert got["published_date"] == obj.published_date
        assert got["content_hash"] == obj.content_hash
        if "_id" in data:
            assert got["_id"] == obj._id
        legacy = data.get("id")
        want_legacy = int(legacy) if isinstance(legacy, str) and legacy.isdigit() else None
        assert got["legacy_id"] == want_legacy


def test_reference_high_water_includes_legacy_id_field():
    """object_model.py:310-317: the numeric legacy `id` bumps the counter —
    fresh ids start above it (mirrored by normalize_legacy_records' offset)."""
    ref = _load_reference_object_model()
    ref.from_dict_probe = ref.ObjectModel.from_dict
    ref.ObjectModel.from_dict({"_id": 10, "url": "https://x.de/1"})
    ref.ObjectModel.from_dict({"id": "5000", "url": "https://x.de/2"})
    fresh = ref.ObjectModel.from_dict({"url": "https://x.de/3"})
    assert fresh._id > 5000


_scalar = st.one_of(st.none(), st.text(max_size=6), st.integers(-10, 10))
_item = st.one_of(
    st.text(max_size=8),
    st.integers(-5, 5),
    st.lists(_scalar, min_size=0, max_size=6),
    st.fixed_dictionaries(
        {},
        optional={
            "id": st.integers(-3, 30), "tid": st.integers(0, 30),
            "wort": st.text(max_size=5), "text": st.text(max_size=5),
            "token": st.text(max_size=5), "lemma": st.text(max_size=5),
            "tags": st.text(max_size=5), "tag": st.text(max_size=5),
            "pos": st.text(max_size=5),
        },
    ),
)
_dirty = st.one_of(
    st.none(),
    st.dictionaries(st.text(min_size=1, max_size=6), st.text(max_size=4), max_size=5),
    st.lists(_item, max_size=8),
)


@settings(max_examples=200, deadline=None)
@given(_dirty)
def test_normalize_pos_taggs_idempotent_and_matches_reference(dirty):
    """Property: normalize ∘ normalize = normalize, and every generated
    dirty shape matches the reference byte-for-byte."""
    ref = _load_reference_object_model.__wrapped__() if hasattr(
        _load_reference_object_model, "__wrapped__") else _load_reference_object_model()
    out = normalize_pos_taggs(dirty)
    assert out == ref.ObjectModel._normalize_pos_taggs(dirty)
    again = normalize_pos_taggs([list(e) for e in out])
    assert again == out


def test_normalize_record_idempotent():
    """normalize(normalize(x)) == normalize(x) over the record gauntlet —
    re-ingesting an already-normalized export is a no-op."""
    records = [
        {"_id": 3, "url": "https://x.de/a", "text": "hallo welt",
         "published_date": "2024-05-06T07:08:09",
         "pos_taggs": [["w", "l", "g", "p"]]},
        {"url": "https://x.de/b", "ai_summary": "alt"},
        {"id": "https://x.de/c", "pos_taggs": {"tok": "NN"}},
        {"id": "777", "text": "inhalt"},
    ]
    for data in records:
        once = normalize_record(dict(data))
        twice = normalize_record({
            k: v for k, v in once.items() if k != "legacy_id"
        })
        once.pop("legacy_id"), twice.pop("legacy_id")
        assert twice == once


def test_normalize_legacy_records_spark_high_water(spark):
    """End-to-end: fresh ids land above max(_id, numeric legacy id); rows
    with _id keep theirs; output is LEGACY_NORMALIZED-shaped."""
    import json

    from german_newspaper_crawler_spark.operators.legacy import (
        normalize_legacy_records,
    )

    recs = [
        {"_id": 7, "url": "https://x.de/a", "text": "a text"},
        {"id": "900", "url": "https://x.de/b", "text": "b text"},
        {"url": "https://x.de/c", "text": "c text"},
    ]
    df = spark.createDataFrame([(json.dumps(r),) for r in recs], ["record"])
    out = {r["url"]: r for r in normalize_legacy_records(df).collect()}
    assert out["https://x.de/a"]["_id"] == 7
    fresh_ids = {out["https://x.de/b"]["_id"], out["https://x.de/c"]["_id"]}
    assert fresh_ids == {901, 902}  # above the legacy-id high-water of 900
    assert out["https://x.de/b"]["legacy_id"] == 900
