"""Param-keyed artifact cache with TTL eviction (S7/S8, SURVEY.md §2.1).

Reference behavior: results are cached as ``event_logs/<key>.xes`` where the
key concatenates all query params (app.py:220-230), probed before recompute
(app.py:87-88), and a scheduled job empties the directory every
``CLEANUP_INTERVAL`` seconds (tasks.py:6-15, app.py:49-58).

Intended-semantics divergences (SURVEY.md §7.4.3): the cache is opt-in via
param (the reference's ``use_cache`` read is buggy and always consults the
cache); the key is a sha256 of the canonical param JSON instead of raw string
concatenation (the reference's key breaks on many resource ids / odd chars);
eviction removes only entries older than the TTL instead of wiping everything
on every tick.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Any


def cache_key(params: dict[str, Any], extension: str = "xes") -> str:
    """Deterministic artifact filename from the full param set (app.py:220-230
    re-expressed as a stable hash; key order canonicalized)."""
    canon = json.dumps(params, sort_keys=True, default=str)
    return f"{hashlib.sha256(canon.encode('utf-8')).hexdigest()}.{extension}"


@dataclass
class ArtifactCache:
    cache_dir: str
    ttl_seconds: float = 3600.0

    def __post_init__(self) -> None:
        os.makedirs(self.cache_dir, exist_ok=True)

    def path_for(self, params: dict[str, Any], extension: str = "xes") -> str:
        return os.path.join(self.cache_dir, cache_key(params, extension))

    def lookup(self, params: dict[str, Any], extension: str = "xes") -> str | None:
        """Cache probe (app.py:87-88): a hit also refreshes the entry's
        mtime (LRU-ish TTL)."""
        path = self.path_for(params, extension)
        if os.path.exists(path):
            os.utime(path, None)
            return path
        return None

    def evict_expired(self, now: float | None = None) -> list[str]:
        """Remove entries older than the TTL; returns evicted paths
        (tasks.py:6-15 with per-entry age instead of wipe-all)."""
        now = now if now is not None else time.time()
        evicted = []
        for name in os.listdir(self.cache_dir):
            path = os.path.join(self.cache_dir, name)
            try:
                if os.path.isfile(path) and now - os.path.getmtime(path) > self.ttl_seconds:
                    os.remove(path)
                    evicted.append(path)
            except FileNotFoundError:
                pass  # concurrent eviction
        return evicted


@dataclass
class CacheJanitor:
    """Background TTL eviction loop (the APScheduler interval job,
    app.py:49-58, on stdlib threading)."""

    cache: ArtifactCache
    interval_seconds: float = 60.0
    _stop: threading.Event = field(default_factory=threading.Event)
    _thread: threading.Thread | None = None

    def start(self) -> None:
        def loop() -> None:
            while not self._stop.wait(self.interval_seconds):
                self.cache.evict_expired()

        self._thread = threading.Thread(target=loop, daemon=True, name="cache-janitor")
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)


def versioned_params(params: dict[str, Any], table_roots: dict[str, str]) -> dict[str, Any]:
    """Bind a cache key to the SNAPSHOT VERSIONS of the tables a query read:
    the returned param set embeds {alias: version} for every given snapshot
    root, so the sha256 key changes exactly when any input table commits a
    new version — stale artifacts are never served after a data change, and
    identical re-queries against unchanged tables still hit.

    This is the table-format completion of the reference's param-keyed
    cache (app.py:220-230): the reference's inputs were immutable per
    request window; snapshot tables make freshness checkable in O(1)
    (reading one manifest pointer), no file-mtime scans."""
    from mobsos_event_log_generator_spark.sources.snapshots import latest_version

    versions = {alias: latest_version(root) for alias, root in sorted(table_roots.items())}
    return {**params, "__table_versions": versions}
