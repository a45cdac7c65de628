"""Cross-process job state: two Engine instances sharing one RESP
backend see each other's query ids — the reference's 2-uvicorn-worker
behavior (state in Redis+Athena, app/redis_setup.py:1-6,
app/main.py:267-277) reproduced over the pluggable KVCache.

The DataFrame handle stays owner-local (only the owner can
preview/export from the retained plan); the STATE — status, result
artifact path, error — crosses registries, so any worker can answer
polls and serve the materialized artifact path."""

from __future__ import annotations

import time

import pytest

from ensembl_lakehouse_spark.engine import Engine
from ensembl_lakehouse_spark.service.jobs import QueryNotFound
from ensembl_lakehouse_spark.service.resp import MiniRedisServer, RedisKVCache
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def engines(spark, tmp_path_factory):
    with MiniRedisServer() as srv:
        cache_a = RedisKVCache(port=srv.port)
        cache_a._c.command("FLUSHDB")
        cache_b = RedisKVCache(port=srv.port)
        a = Engine(spark, work_dir=str(tmp_path_factory.mktemp("worker_a")), cache=cache_a)
        b = Engine(spark, work_dir=str(tmp_path_factory.mktemp("worker_b")), cache=cache_b)
        a.catalog.register_dir(SF_DIR)
        b.catalog.register_dir(SF_DIR)
        yield a, b
        a.close()
        b.close()
        cache_a.close()
        cache_b.close()


def _poll(engine, qid: str, timeout: float = 180) -> dict:
    deadline = time.time() + timeout
    while time.time() < deadline:
        out = engine.query_status(qid)
        if out["status"] in ("SUCCEEDED", "FAILED"):
            return out
        time.sleep(0.2)
    raise AssertionError("timeout")


def test_submit_on_a_polls_succeeded_on_b(engines):
    a, b = engines
    qid = a.submit_analytics("distinct_key", SF_DIR)["query_id"]
    # B never saw this submission; its poll is answered from the
    # shared state store, including the result artifact path.
    out = _poll(b, qid)
    assert out["status"] == "SUCCEEDED"
    assert out["result"]
    assert "result_url" in out  # B signs the artifact path too

    # the owner-local division: B has no retained DataFrame for the
    # id, so plan-needing surfaces 404 rather than guessing
    with pytest.raises(QueryNotFound):
        b.registry.get(qid)


def test_semantic_cache_is_shared_across_workers(engines):
    a, b = engines
    first = a.submit_analytics("preview_limit", SF_DIR)["query_id"]
    a.registry.wait(first, timeout=120)
    # same canonical submission on B: no new Spark job, A's id back
    again = b.submit_analytics("preview_limit", SF_DIR)["query_id"]
    assert again == first
    assert _poll(b, first)["status"] == "SUCCEEDED"


def test_unknown_id_still_404s_with_shared_store(engines):
    _, b = engines
    with pytest.raises(QueryNotFound):
        b.query_status("00000000-0000-0000-0000-000000000000")


def test_dead_peer_running_state_does_not_poison_cache(engines):
    """Review regression: a worker that crashed mid-run leaves
    query_cache -> qid and query_state=RUNNING behind forever (44-day
    TTL, no owner left to update them). A surviving worker must treat
    that as a miss and resubmit, not hand out the orphaned id."""
    import json as _json

    _, b = engines
    dead_qid = "99999999-9999-4999-8999-999999999999"
    key = f"analytics\x1fagg_filtered\x1f{SF_DIR}"
    b.cache.set(f"query_cache:{key}", dead_qid)
    b.cache.set(
        f"query_state:{dead_qid}", _json.dumps({"status": "RUNNING"})
    )
    out = b.submit_analytics("agg_filtered", SF_DIR)
    assert out["query_id"] != dead_qid
    assert _poll(b, out["query_id"])["status"] == "SUCCEEDED"


def test_peer_succeeded_with_unreachable_result_path_is_a_miss(engines):
    """ADVICE r4 regression: with a shared Redis but per-host local
    disks, a peer's SUCCEEDED state points at a results_dir that does
    not exist on this host — honoring it would hand clients a dead
    link. The registry probes the path and resubmits instead."""
    import json as _json

    _, b = engines
    ghost_qid = "88888888-8888-4888-8888-888888888888"
    key = f"analytics\x1fdistinct_key\x1f{SF_DIR}"
    b.cache.set(f"query_cache:{key}", ghost_qid)
    b.cache.set(
        f"query_state:{ghost_qid}",
        _json.dumps(
            {
                "status": "SUCCEEDED",
                "result": "/nonexistent-host-disk/results/" + ghost_qid,
            }
        ),
    )
    out = b.submit_analytics("distinct_key", SF_DIR)
    assert out["query_id"] != ghost_qid
    assert _poll(b, out["query_id"])["status"] == "SUCCEEDED"
