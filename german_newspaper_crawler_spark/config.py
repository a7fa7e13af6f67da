"""Config handling (S1/S2 analog).

Reference: cached YAML loader with empty-dict-on-error semantics
(``lib/common/config_handler.py:29-71``) and a typed Mongo section with
env-var fallbacks (``:74-101``). Here: same lenient loader; the storage
section configures the snapshot store root (an Iceberg catalog in
production); domains become the seeds DataFrame (config order preserved —
it drives the crawl's domain ordering, ``scr/german_newspaper_crawler.py:76``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from urllib.parse import urlsplit

_CACHE: dict[str, dict] = {}


def load_config(path: str | None = None, force_reload: bool = False) -> dict:
    """Read+cache YAML; empty dict on any error (config_handler.py:29-71)."""
    path = path or os.environ.get("GNCS_CONFIG", "configs/config.yaml")
    if not force_reload and path in _CACHE:
        return _CACHE[path]
    try:
        import yaml

        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
        if not isinstance(cfg, dict):
            cfg = {}
    except Exception:
        cfg = {}
    _CACHE[path] = cfg
    return cfg


@dataclass
class StoreConfig:
    """Storage section (the reference's MongoConfig analog,
    config_handler.py:74-101 — uri/database → store root / catalog)."""

    root: str = "./gncs_store"
    catalog: str | None = None  # Iceberg catalog name when deployed


@dataclass
class Seed:
    domain: str
    base_url: str
    host: str = ""
    collection: str = ""

    def __post_init__(self):
        if not self.host:
            self.host = urlsplit(self.base_url).netloc.lower()
        if not self.collection:
            self.collection = self.domain


def load_store_config(path: str | None = None) -> StoreConfig:
    cfg = load_config(path)
    s = cfg.get("storage") or cfg.get("store") or {}
    return StoreConfig(
        root=s.get("root") or os.environ.get("GNCS_STORE", "./gncs_store"),
        catalog=s.get("catalog"),
    )


def load_seeds(path: str | None = None) -> list[Seed]:
    """domains section → seeds in config order (config.yaml:13-17 shape:
    name/collection/base_url; class_path is replaced by the in-repo parser)."""
    cfg = load_config(path)
    out = []
    for d in cfg.get("domains") or []:
        base = d.get("base_url") or d.get("url")
        name = d.get("name") or d.get("domain")
        if not base or not name:
            continue
        out.append(Seed(domain=name, base_url=base, collection=d.get("collection", "")))
    return out
