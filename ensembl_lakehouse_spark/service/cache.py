"""Pluggable KV cache with TTL — replaces the reference's Redis use.

The reference keeps five kinds of state in Redis (app/main.py:
119-130 table list, :179-187 species list, :189-196 schema, :222-228
format list, :472-489 semantic query cache with a 44-day TTL;
app/tasks.py:34-37 delayed key delete as a retry throttle). All of
those reduce to get/set/exists/expire/delete, so the engine codes
against this tiny interface; a Redis-backed implementation can be
swapped in without touching callers.
"""

from __future__ import annotations

import threading
import time
from typing import Any

# Reference TTLs (app/main.py:488, app/main.py:349).
QUERY_CACHE_TTL_SECONDS = 3_801_600  # 44 days
FAILED_EXPORT_RETRY_SECONDS = 60


class KVCache:
    """Thread-safe in-process KV store with per-key TTL."""

    def __init__(self, clock=time.monotonic):
        self._data: dict[str, tuple[Any, float | None]] = {}
        self._lock = threading.Lock()
        self._clock = clock

    def get(self, key: str, default: Any = None) -> Any:
        with self._lock:
            entry = self._data.get(key)
            if entry is None:
                return default
            value, expires_at = entry
            if expires_at is not None and self._clock() >= expires_at:
                del self._data[key]
                return default
            return value

    def set(self, key: str, value: Any, ttl_seconds: float | None = None) -> None:
        expires_at = self._clock() + ttl_seconds if ttl_seconds is not None else None
        with self._lock:
            self._data[key] = (value, expires_at)

    def exists(self, key: str) -> bool:
        return self.get(key, _MISSING) is not _MISSING

    def delete(self, key: str) -> None:
        with self._lock:
            self._data.pop(key, None)

    def expire(self, key: str, ttl_seconds: float) -> None:
        with self._lock:
            entry = self._data.get(key)
            if entry is not None:
                self._data[key] = (entry[0], self._clock() + ttl_seconds)

    def invalidate_prefix(self, prefix: str) -> None:
        with self._lock:
            for key in [k for k in self._data if k.startswith(prefix)]:
                del self._data[key]


class _Missing:
    pass


_MISSING = _Missing()
