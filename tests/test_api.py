"""Wire-contract tests for the HTTP/HAL layer — replicates the
reference's Postman collection over a live threaded server
(postman_collection.json:8-266; endpoint semantics SURVEY §2.2)."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request

import pytest

from ensembl_lakehouse_spark.api import ApiServer


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from ensembl_lakehouse_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, work_dir=str(tmp_path_factory.mktemp("api_work")))
    eng.catalog.register_dir(SF_DIR)
    with ApiServer(eng) as srv:
        yield srv
    eng.close()


def _get(server, path: str):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}") as resp:
            return resp.status, dict(resp.headers), json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), json.loads(e.read())


def test_banner_and_correlation_id(server):
    status, headers, body = _get(server, "/")
    assert status == 200
    assert "message" in body
    assert "X-Correlation-ID" in headers
    # New id per request (app/main.py:32-43).
    _, headers2, _ = _get(server, "/")
    assert headers["X-Correlation-ID"] != headers2["X-Correlation-ID"]


def test_data_types_and_formats(server):
    status, _, body = _get(server, "/data_types")
    assert status == 200 and "lineitem" in body
    status, _, formats = _get(server, "/result_file_formats")
    assert status == 200
    # Reference enum first, EXT formats (orc) appended.
    assert formats == ["csv", "tsv", "xlsx", "json", "xml", "feather", "parquet", "orc"]


def test_filters_ok_and_errors(server):
    status, _, body = _get(server, "/filters/lineitem")
    assert status == 200
    assert {"Name": "l_returnflag", "Type": "string"} in body["columns"]
    assert body["species"] == ["A", "N", "R"]

    status, _, body = _get(server, "/filters/nope")
    assert status == 404
    assert body["detail"] == "Selected data type: nope does not exist!"

    status, _, _ = _get(server, "/filters/%20")
    assert status == 400


def test_submit_status_preview_export_lifecycle(server):
    status, headers, body = _get(
        server,
        "/query/lineitem/R?fields=l_orderkey,l_extendedprice&condition=l_quantity%20%3E%2040",
    )
    assert status == 200
    assert headers["Content-Type"] == "application/hal+json"
    qid = body["query_id"]
    links = body["_links"]
    assert links["export"]["supported_file_formats"][0] == "csv"
    assert links["status"]["href"] == f"/query/{qid}/status"

    deadline = time.time() + 120
    while time.time() < deadline:
        status, _, st = _get(server, f"/query/{qid}/status")
        if st.get("status") in ("SUCCEEDED", "FAILED"):
            break
        time.sleep(0.5)
    assert st["status"] == "SUCCEEDED"
    assert "result" in st

    status, _, prev = _get(server, f"/query/{qid}/preview?maxResults=3")
    assert status == 200
    header = [d["VarCharValue"] for d in prev["Rows"][0]["Data"]]
    assert header == ["l_orderkey", "l_extendedprice"]
    # Athena's MaxResults counts the header row (row 0) within the
    # limit — the reference returns that shape verbatim.
    assert len(prev["Rows"]) == 3  # header + 2 data rows

    status, _, exp = _get(server, f"/query/{qid}/export?file_format=parquet")
    assert status in (200, 202)
    deadline = time.time() + 120
    while time.time() < deadline:
        status, _, exp = _get(server, f"/query/{qid}/export?file_format=parquet")
        if exp["status"] == "DONE":
            break
        time.sleep(0.5)
    assert status == 200 and exp["status"] == "DONE"


def test_query_id_validation_and_not_found(server):
    status, _, body = _get(server, "/query/not-a-uuid/status")
    assert status == 400 and body["detail"] == "Invalid query_id!"

    ghost = "00000000-0000-0000-0000-000000000000"
    status, _, body = _get(server, f"/query/{ghost}/status")
    assert status == 404
    assert body["detail"] == f"Query: {ghost} was not found!"


def test_preview_range_check(server):
    ghost = "00000000-0000-0000-0000-000000000000"
    status, _, _ = _get(server, f"/query/{ghost}/preview?maxResults=5000")
    assert status == 400


def test_presigned_result_url_roundtrip(server):
    """S12: SUCCEEDED status carries a presigned URL; fetching it
    serves the result bytes (part headers deduped); tampering with
    the signature is a 403."""
    _, _, body = _get(server, "/query/lineitem/R?fields=l_orderkey,l_returnflag")
    qid = body["query_id"]
    deadline = time.time() + 120
    while time.time() < deadline:
        _, _, st = _get(server, f"/query/{qid}/status")
        if st.get("status") == "SUCCEEDED":
            break
        time.sleep(0.5)
    url = st["result_url"]
    assert url.startswith("/download?")

    with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{url}") as resp:
        assert resp.status == 200
        text = resp.read().decode()
    assert text.count("l_orderkey,l_returnflag") == 1  # one header total
    assert text.count("\n") > 1

    tampered = url.replace("signature=", "signature=0")
    try:
        urllib.request.urlopen(f"http://127.0.0.1:{server.port}{tampered}")
        raise AssertionError("tampered signature accepted")
    except urllib.error.HTTPError as e:
        assert e.code == 403


def test_url_signer_expiry():
    from urllib.parse import unquote

    from ensembl_lakehouse_spark.service.urls import UrlSigner

    now = [1000.0]
    s = UrlSigner(secret=b"k", clock=lambda: now[0])
    url = s.sign("/tmp/x", ttl_seconds=10)
    # parse_qs in the HTTP layer decodes exactly once; verify takes
    # the decoded path (signing and verifying hash the same bytes).
    q = {
        k: unquote(v)
        for k, v in (p.split("=", 1) for p in url.split("?", 1)[1].split("&"))
    }
    assert s.verify(q["path"], q["expires"], q["signature"])
    now[0] += 11
    assert not s.verify(q["path"], q["expires"], q["signature"])


def test_url_signer_handles_percent_looking_paths():
    """A path whose literal text contains %XX must round-trip: the
    old double-unquote in verify broke every such path (403s)."""
    from urllib.parse import unquote

    from ensembl_lakehouse_spark.service.urls import UrlSigner

    s = UrlSigner(secret=b"k", clock=lambda: 0.0)
    weird = "/data/v%20final/results/abc"
    url = s.sign(weird, ttl_seconds=100)
    q = {
        k: unquote(v)
        for k, v in (p.split("=", 1) for p in url.split("?", 1)[1].split("&"))
    }
    assert q["path"] == weird
    assert s.verify(q["path"], q["expires"], q["signature"])


def test_export_unsupported_format_is_422(server):
    status, headers, body = _get(server, "/query/lineitem/R")
    qid = body["query_id"]
    deadline = time.time() + 120
    while time.time() < deadline:
        _, _, st = _get(server, f"/query/{qid}/status")
        if st.get("status") == "SUCCEEDED":
            break
        time.sleep(0.5)
    status, _, _ = _get(server, f"/query/{qid}/export?file_format=docx")
    assert status == 422


def test_analytics_endpoint_full_flow(server):
    """EXT /analytics: list names, submit a named operator query,
    poll to success, preview through the standard endpoint."""
    status, _, names = _get(server, "/analytics")
    assert status == 200
    assert "bm25_search" in names and "graph_pagerank" in names

    status, _, resp = _get(server, "/analytics/bm25_search")
    assert status == 200
    qid = resp["query_id"]
    assert resp["_links"]["preview"] == f"/query/{qid}/preview"
    deadline = time.time() + 180
    while time.time() < deadline:
        status, _, body = _get(server, f"/query/{qid}/status")
        if body.get("status") in ("SUCCEEDED", "FAILED"):
            break
        time.sleep(0.5)
    assert body["status"] == "SUCCEEDED"
    status, _, prev = _get(server, f"/query/{qid}/preview?maxResults=3")
    header = [c["VarCharValue"] for c in prev["Rows"][0]["Data"]]
    assert header == ["doc_id", "n_terms_matched", "score_fp", "score"]

    # semantic cache: resubmission returns the same id
    _, _, again = _get(server, "/analytics/bm25_search")
    assert again["query_id"] == qid

    status, _, err = _get(server, "/analytics/nope_not_real")
    assert status == 400 and "unknown analytics query" in err["detail"]


def test_sql_endpoint(server):
    import urllib.parse

    q = urllib.parse.quote(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    )
    status, _, resp = _get(server, f"/sql?query={q}")
    assert status == 200 and "query_id" in resp

    bad = urllib.parse.quote("DROP TABLE lineitem")
    status, _, err = _get(server, f"/sql?query={bad}")
    assert status == 400 and "read-only" in err["detail"]

    status, _, err = _get(server, "/sql")
    assert status == 400
