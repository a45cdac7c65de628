"""KVCache contract tests over both backends.

The reference shares cache + job state between two API workers through
Redis (reference app/redis_setup.py:1-6). The repo's interface is
pluggable; these tests run the SAME contract against:

- the default in-process dict backend (``service.cache.KVCache``), and
- the RESP adapter (``service.resp.RedisKVCache``) speaking the real
  Redis wire protocol over TCP to the in-process ``MiniRedisServer``
  (the env ships no redis-server binary; against a real instance only
  host/port change).

No Spark involved — these are pure service-layer tests.
"""

import time

import pytest

from ensembl_lakehouse_spark.service.cache import KVCache
from ensembl_lakehouse_spark.service.resp import MiniRedisServer, RedisKVCache, RespClient


@pytest.fixture(scope="module")
def mini_server():
    with MiniRedisServer() as srv:
        yield srv


@pytest.fixture(params=["dict", "resp"])
def cache(request, mini_server):
    if request.param == "dict":
        yield KVCache()
    else:
        c = RedisKVCache(port=mini_server.port)
        c._c.command("FLUSHDB")
        yield c
        c.close()


def test_get_set_roundtrip(cache):
    assert cache.get("k") is None
    assert cache.get("k", default="d") == "d"
    cache.set("k", {"a": [1, 2], "b": "x"})
    assert cache.get("k") == {"a": [1, 2], "b": "x"}


def test_exists_delete(cache):
    cache.set("k1", 1)
    assert cache.exists("k1")
    cache.delete("k1")
    assert not cache.exists("k1")
    cache.delete("k1")  # idempotent


def test_ttl_expiry(cache):
    cache.set("t", "v", ttl_seconds=0.05)
    assert cache.get("t") == "v"
    time.sleep(0.12)
    assert cache.get("t") is None
    assert not cache.exists("t")


def test_expire_resets_ttl(cache):
    cache.set("t", "v")
    cache.expire("t", 0.05)
    time.sleep(0.12)
    assert cache.get("t") is None


def test_invalidate_prefix_scoped(cache):
    """The r1 regression pinned on both backends: metadata invalidation
    must not nuke query-result keys."""
    cache.set("meta:data_types", ["a"])
    cache.set("meta:gene_table_metadata", ["b"])
    cache.set("query_cache:abc", "result-handle")
    cache.invalidate_prefix("meta:")
    assert cache.get("meta:data_types") is None
    assert cache.get("meta:gene_table_metadata") is None
    assert cache.get("query_cache:abc") == "result-handle"


def test_complex_values_pickle(cache):
    from ensembl_lakehouse_spark.catalog import ColumnInfo
    cols = [ColumnInfo("doc_id", "bigint"), ColumnInfo("text", "string")]
    cache.set("meta:documents_table_metadata", cols)
    assert cache.get("meta:documents_table_metadata") == cols


def test_resp_wire_protocol_basics(mini_server):
    """Protocol-level pin: the adapter's exact command shapes."""
    c = RespClient(port=mini_server.port)
    assert c.command("PING") == "PONG"
    assert c.command("SET", "wire", b"\x00binary\r\nsafe") == "OK"
    assert c.command("GET", "wire") == b"\x00binary\r\nsafe"
    assert c.command("EXISTS", "wire") == 1
    assert c.command("DEL", "wire") == 1
    assert c.command("GET", "wire") is None
    c.close()


def test_catalog_on_resp_backend(mini_server):
    """The engine's Catalog runs unmodified on the RESP backend — the
    pluggability claim exercised end-to-end at the caller."""
    from ensembl_lakehouse_spark.catalog import META_PREFIX
    c = RedisKVCache(port=mini_server.port)
    c._c.command("FLUSHDB")
    c.set(META_PREFIX + "data_types", ["documents", "region"])
    assert c.get(META_PREFIX + "data_types") == ["documents", "region"]
    c.invalidate_prefix(META_PREFIX)
    assert c.get(META_PREFIX + "data_types") is None
    c.close()
