"""Async query lifecycle: submit → status → result artifact.

Replaces the reference's Athena async API:

- submit   ~ ``start_query_execution`` returning a query id
  immediately (app/main.py:478-485);
- status   ~ ``get_query_execution`` with the five-state machine
  QUEUED | RUNNING | SUCCEEDED | FAILED | CANCELLED
  (app/main.py:263-277);
- result   ~ the ``{query_id}.csv`` artifact in the results bucket
  plus a presigned URL (app/main.py:272); here a local results
  directory (an object store behind the same interface in prod).

Execution runs on a thread pool; each query is tagged with a Spark
job group named by its query id, so CANCELLED maps onto
``sparkContext.cancelJobGroup`` — the Spark-native analog of
Athena's stop_query_execution. Query ids use the same 36-char
UUID shape the reference validates (app/main.py:70-76).

The semantic cache (plans/canonical.py) sits in front of submit:
a canonical-key hit returns the prior query id without touching
Spark, mirroring app/main.py:472-474, with the reference's 44-day
TTL.
"""

from __future__ import annotations

import json
import os
import re
import threading
import traceback
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from ensembl_lakehouse_spark.service.cache import KVCache, QUERY_CACHE_TTL_SECONDS

# Reference states (app/main.py:267-270).
QUEUED = "QUEUED"
RUNNING = "RUNNING"
SUCCEEDED = "SUCCEEDED"
FAILED = "FAILED"
CANCELLED = "CANCELLED"

_QUERY_ID_RE = re.compile(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")


def is_valid_query_id(query_id: str) -> bool:
    """Shape check matching the reference's validator: 36 chars, 4
    hyphens, UUID layout (app/main.py:70-76)."""
    return bool(_QUERY_ID_RE.match(query_id or ""))


@dataclass
class QueryHandle:
    query_id: str
    state: str = QUEUED
    error: str | None = None
    result_path: str | None = None
    # The logical plan is retained so preview/export re-use the typed
    # DataFrame instead of re-parsing CSV text (the reference loses
    # types by round-tripping through CSV, app/tasks.py:19).
    df: DataFrame | None = None
    row_count: int | None = None
    #: semantic-cache key this handle was registered under, kept so a
    #: terminal failure can evict itself (see _run)
    cache_key: str | None = None
    _done: threading.Event = field(default_factory=threading.Event, repr=False)

    def wait(self, timeout: float | None = None) -> bool:
        return self._done.wait(timeout)


class QueryRegistry:
    """Submit/track/cancel queries; materialize results as CSV.

    ``max_workers`` bounds concurrent materializations (the
    reference's analog: 2 uvicorn workers / Athena's own queue). The
    Spark scheduler interleaves the jobs; FAIR scheduling can be
    enabled via spark.scheduler.mode for latency isolation.
    """

    def __init__(
        self,
        spark: SparkSession,
        results_dir: str,
        cache: KVCache | None = None,
        max_workers: int = 4,
    ):
        self.spark = spark
        self.results_dir = results_dir
        self.cache = cache if cache is not None else KVCache()
        self._handles: dict[str, QueryHandle] = {}
        self._lock = threading.Lock()
        self._pool = ThreadPoolExecutor(max_workers=max_workers, thread_name_prefix="elh-query")
        os.makedirs(results_dir, exist_ok=True)

    # -- submit -------------------------------------------------------

    def cached_query_id(self, cache_key: str) -> str | None:
        """Live query id for a semantic-cache key, or None. Exposed
        so callers whose PLAN CONSTRUCTION is itself expensive
        (analytics operators that train/collect eagerly) can probe
        the cache BEFORE building the DataFrame — submit() probes
        again, but by then the plan already exists.

        With a shared cache backend (RedisKVCache), the prior id may
        belong to a PEER process: it is honored ONLY once that peer
        published SUCCEEDED (the reference's 2-uvicorn-worker
        behavior, app/main.py:472-474 over app/redis_setup.py, where
        Athena durably owns in-flight queries — here nothing outlives
        the owner process, so honoring a peer's QUEUED/RUNNING id
        would poison this key for the 44-day TTL if that peer died
        mid-run: every resubmission would return an orphaned id that
        never reaches a terminal state). The cost of the conservative
        rule is bounded duplicate work when two workers race the same
        cold query; the winner's SUCCEEDED state then serves both."""
        prior = self.cache.get(f"query_cache:{cache_key}")
        if prior is None:
            return None
        if prior in self._handles:
            return prior
        shared = self._shared_state(prior)
        if shared is not None and shared.get("status") == SUCCEEDED:
            # A peer's result path is only serveable from THIS host if
            # the results_dir is actually shared storage (NFS/fuse
            # mount — or the peer is a co-hosted worker, the default
            # single-host deployment). A shared Redis with per-host
            # local disks would otherwise hand clients a path that
            # does not exist here; the existence probe makes the
            # honored-peer rule self-configuring instead of trusting
            # a deployment flag.
            result = shared.get("result")
            if result is not None and not os.path.exists(result):
                return None
            return prior
        return None

    def _publish(self, handle: QueryHandle) -> None:
        """Write the handle's externally-visible state to the cache
        backend so peer registries sharing it (RESP/Redis) can answer
        status polls for this id — the DataFrame stays local, the
        STATE crosses processes, exactly the split the reference has
        between its uvicorn workers (state in Redis+Athena) and each
        worker's boto3 clients."""
        state: dict[str, str] = {"status": handle.state}
        if handle.result_path:
            state["result"] = handle.result_path
        if handle.error:
            state["error"] = handle.error
        self.cache.set(
            f"query_state:{handle.query_id}",
            json.dumps(state),
            ttl_seconds=QUERY_CACHE_TTL_SECONDS,
        )

    def _shared_state(self, query_id: str) -> dict | None:
        raw = self.cache.get(f"query_state:{query_id}")
        if raw is None:
            return None
        try:
            out = json.loads(raw)
        except (TypeError, ValueError):
            return None
        return out if isinstance(out, dict) else None

    def submit(self, df: DataFrame, cache_key: str | None = None) -> str:
        """Submit a query plan for async materialization; returns the
        query id immediately (reference app/main.py:478-489).

        On a semantic-cache hit the prior query id is returned and no
        Spark job runs (app/main.py:472-474)."""
        if cache_key is not None:
            prior = self.cached_query_id(cache_key)
            if prior is not None:
                return prior

        query_id = str(uuid.uuid4())
        handle = QueryHandle(query_id=query_id, df=df, cache_key=cache_key)
        with self._lock:
            self._handles[query_id] = handle
        self._publish(handle)
        if cache_key is not None:
            self.cache.set(f"query_cache:{cache_key}", query_id, ttl_seconds=QUERY_CACHE_TTL_SECONDS)
        self._pool.submit(self._run, handle)
        return query_id

    def _run(self, handle: QueryHandle) -> None:
        if handle.state == CANCELLED:
            if handle.cache_key is not None:
                self.cache.delete(f"query_cache:{handle.cache_key}")
            self._publish(handle)
            handle._done.set()
            return
        handle.state = RUNNING
        self._publish(handle)
        out_dir = os.path.join(self.results_dir, handle.query_id)
        try:
            self.spark.sparkContext.setJobGroup(handle.query_id, f"query {handle.query_id}", True)
            # Single-header CSV artifact like Athena's {query_id}.csv
            # (app/main.py:272). At export scale (human-sized result
            # sets) a coalesce(1) is fine; unbounded results keep
            # their natural partitioning via the directory writer.
            handle.df.write.mode("overwrite").option("header", True).csv(out_dir)
            handle.result_path = out_dir
            handle.state = SUCCEEDED
        except Exception:
            if handle.state != CANCELLED:
                handle.state = FAILED
                handle.error = traceback.format_exc(limit=5)
            # Evict the semantic-cache entry: a FAILED/CANCELLED id
            # must not be served to resubmissions for the 44-day TTL
            # (one transient failure would otherwise make the query
            # unrunnable until the entry expired).
            if handle.cache_key is not None:
                self.cache.delete(f"query_cache:{handle.cache_key}")
        finally:
            self._publish(handle)
            self.spark.sparkContext.setJobGroup("", "")
            handle._done.set()

    # -- status / result ---------------------------------------------

    def get(self, query_id: str) -> QueryHandle:
        """Lookup with the reference's error mapping: bad shape → 400
        (InvalidQueryId), unknown id → 404 'was not found'
        (app/main.py:265,276)."""
        if not is_valid_query_id(query_id):
            raise InvalidQueryId(query_id)
        handle = self._handles.get(query_id)
        if handle is None:
            raise QueryNotFound(query_id)
        return handle

    def status(self, query_id: str) -> dict:
        """Reference GET /query/{id}/status shape (app/main.py:269-273):
        ``{"status": s}`` plus ``result`` path when SUCCEEDED.

        Falls back to the shared state store for ids owned by a peer
        process (2-worker parity). Preview/export stay owner-local:
        they need the retained typed DataFrame; a peer serves the
        materialized artifact via ``result`` instead — the same
        division the reference has (any worker returns the S3 path,
        only Athena holds the plan)."""
        if not is_valid_query_id(query_id):
            raise InvalidQueryId(query_id)
        handle = self._handles.get(query_id)
        if handle is not None:
            if handle.state == SUCCEEDED:
                return {"status": handle.state, "result": handle.result_path}
            return {"status": handle.state}
        shared = self._shared_state(query_id)
        if shared is None:
            raise QueryNotFound(query_id)
        if shared.get("status") == SUCCEEDED and "result" in shared:
            return {"status": SUCCEEDED, "result": shared["result"]}
        return {"status": shared.get("status", QUEUED)}

    def cancel(self, query_id: str) -> None:
        handle = self.get(query_id)
        if handle.state in (QUEUED, RUNNING):
            handle.state = CANCELLED
            self._publish(handle)
            self.spark.sparkContext.cancelJobGroup(query_id)

    def wait(self, query_id: str, timeout: float | None = 300) -> QueryHandle:
        handle = self.get(query_id)
        handle.wait(timeout)
        return handle

    def shutdown(self) -> None:
        self._pool.shutdown(wait=True)


class InvalidQueryId(ValueError):
    """400: malformed query id (reference app/main.py:70-76)."""


class QueryNotFound(KeyError):
    """404: 'Queried query_id was not found!' (reference app/main.py:276)."""
