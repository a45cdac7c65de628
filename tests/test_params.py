"""Per-request analytics parameters (service/params.py): spec
defaults pinned to the operator keyword defaults, fail-closed
validation, cache-key collapse for explicit defaults, and the
end-to-end custom-terms BM25 flow through the HTTP surface."""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request

import pytest

from ensembl_lakehouse_spark.operators import search as SR
from ensembl_lakehouse_spark.operators import similarity as SIM
from ensembl_lakehouse_spark.service.params import (
    PARAM_SPECS,
    ParamError,
    params_cache_suffix,
    resolve_params,
)


def test_spec_defaults_equal_operator_keyword_defaults():
    """If an operator default drifts from its spec default, explicit
    requests and bare requests would silently diverge — pin them."""
    assert PARAM_SPECS["bm25_search"]["terms"].default == SR.QUERY_TERMS
    assert PARAM_SPECS["bm25_search"]["topk"].default == SR.BM25_TOPK
    assert PARAM_SPECS["similarity_topk"]["n_queries"].default == SIM.N_QUERIES
    assert PARAM_SPECS["similarity_topk"]["topk"].default == SIM.TOP_K
    assert PARAM_SPECS["similarity_ivf"]["n_probe"].default == SIM.IVF_NPROBE


def test_resolve_drops_defaults_and_coerces_strings():
    # explicit defaults resolve to {} -> same cache key as bare
    assert resolve_params("bm25_search", {"topk": str(SR.BM25_TOPK)}) == {}
    assert (
        resolve_params("bm25_search", {"terms": ",".join(SR.QUERY_TERMS)}) == {}
    )
    out = resolve_params("bm25_search", {"terms": "Alpha, beta", "topk": "5"})
    assert out == {"terms": ("alpha", "beta"), "topk": 5}
    assert params_cache_suffix({}) == ""
    assert params_cache_suffix(out) == params_cache_suffix(dict(reversed(out.items())))


def test_resolve_fails_closed():
    with pytest.raises(ParamError):
        resolve_params("bm25_search", {"nope": 1})
    with pytest.raises(ParamError):
        resolve_params("scan_project", {"topk": 3})  # no spec -> no params
    with pytest.raises(ParamError):
        resolve_params("bm25_search", {"topk": "not-an-int"})
    with pytest.raises(ParamError):
        resolve_params("bm25_search", {"topk": 0})
    with pytest.raises(ParamError):
        resolve_params("bm25_search", {"topk": 10_001})
    with pytest.raises(ParamError):
        resolve_params("bm25_search", {"terms": " , "})
    with pytest.raises(ParamError):
        resolve_params("bm25_search", {"terms": ",".join(["x"] * 65)})


@pytest.fixture(scope="module")
def server(spark, tmp_path_factory):
    from ensembl_lakehouse_spark.api import ApiServer
    from ensembl_lakehouse_spark.engine import Engine
    from tests.conftest import SF_DIR

    eng = Engine(spark, work_dir=str(tmp_path_factory.mktemp("params_work")))
    eng.catalog.register_dir(SF_DIR)
    with ApiServer(eng) as srv:
        yield srv
    eng.close()


def _get(server, path: str):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}") as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _wait(server, qid: str) -> str:
    deadline = time.time() + 180
    while time.time() < deadline:
        _, body = _get(server, f"/query/{qid}/status")
        if body.get("status") in ("SUCCEEDED", "FAILED"):
            return body["status"]
        time.sleep(0.5)
    return "TIMEOUT"


def test_bm25_custom_terms_end_to_end(server):
    """Custom query terms through submit -> preview -> export: the
    'search for MY terms' flow the operator library owed its users."""
    qs = urllib.parse.urlencode({"terms": "table,join", "topk": "5"})
    status, resp = _get(server, f"/analytics/bm25_search?{qs}")
    assert status == 200
    qid = resp["query_id"]
    assert _wait(server, qid) == "SUCCEEDED"

    status, prev = _get(server, f"/query/{qid}/preview?maxResults=10")
    header = [c["VarCharValue"] for c in prev["Rows"][0]["Data"]]
    assert header == ["doc_id", "n_terms_matched", "score_fp", "score"]
    assert 1 <= len(prev["Rows"]) - 1 <= 5  # topk honored

    # distinct params -> distinct query id; same params -> cache hit
    _, bare = _get(server, "/analytics/bm25_search")
    assert bare["query_id"] != qid
    _, again = _get(server, f"/analytics/bm25_search?{qs}")
    assert again["query_id"] == qid
    # explicit defaults collapse onto the bare submission
    dflt = urllib.parse.urlencode(
        {"terms": ",".join(SR.QUERY_TERMS), "topk": str(SR.BM25_TOPK)}
    )
    _, explicit = _get(server, f"/analytics/bm25_search?{dflt}")
    assert explicit["query_id"] == bare["query_id"]

    # export the parameterized result through the standard endpoint
    status, exp = _get(server, f"/query/{qid}/export?file_format=csv")
    assert status in (200, 202)
    deadline = time.time() + 120
    while time.time() < deadline:
        status, exp = _get(server, f"/query/{qid}/export?file_format=csv")
        if exp["status"] == "DONE":
            break
        time.sleep(0.5)
    assert status == 200 and exp["status"] == "DONE"

    # undeclared / out-of-bounds params are 400s, not 500s
    status, err = _get(server, "/analytics/bm25_search?bogus=1")
    assert status == 400 and "bogus" in err["detail"]
    status, err = _get(server, "/analytics/scan_project?topk=3")
    assert status == 400 and "accepts no parameters" in err["detail"]
    status, err = _get(server, "/analytics/similarity_ivf?n_probe=9999")
    assert status == 400


def test_ivf_nprobe_override_runs(server):
    status, resp = _get(server, "/analytics/similarity_ivf?n_probe=2&topk=3")
    assert status == 200
    assert _wait(server, resp["query_id"]) == "SUCCEEDED"
    _, prev = _get(server, f"/query/{resp['query_id']}/preview?maxResults=26")
    ranks = {
        row["Data"][1]["VarCharValue"] for row in prev["Rows"][1:]
    }
    assert ranks <= {"1", "2", "3"}


def test_retrieval_param_specs_pinned():
    assert PARAM_SPECS["rank_fusion"]["k"].default == SR.RRF_K
    assert PARAM_SPECS["mmr_rerank"]["pool"].default == SR.MMR_POOL
    out = resolve_params("mmr_rerank", {"select_k": "3", "pool": "10"})
    assert out == {"select_k": 3, "pool": 10}


def test_mmr_select_override_end_to_end(server):
    status, resp = _get(server, "/analytics/mmr_rerank?select_k=3&pool=10")
    assert status == 200
    assert _wait(server, resp["query_id"]) == "SUCCEEDED"
    _, prev = _get(server, f"/query/{resp['query_id']}/preview?maxResults=26")
    assert len(prev["Rows"]) - 1 == 3


def test_params_discovery_endpoint(server):
    status, spec = _get(server, "/analytics/bm25_search/params")
    assert status == 200
    assert spec["terms"]["default"] == list(SR.QUERY_TERMS)
    assert spec["topk"]["default"] == SR.BM25_TOPK
    status, spec = _get(server, "/analytics/scan_project/params")
    assert status == 200 and spec == {}
    status, err = _get(server, "/analytics/nope/params")
    assert status == 400


def test_dedup_near_threshold_param(server):
    from ensembl_lakehouse_spark.operators import dedup as D

    assert PARAM_SPECS["dedup_near"]["threshold"].default == D.JACCARD_THRESHOLD
    assert resolve_params("dedup_near", {"threshold": "0.5"}) == {"threshold": 0.5}
    with pytest.raises(ParamError):
        resolve_params("dedup_near", {"threshold": "1.5"})
    status, resp = _get(server, "/analytics/dedup_near?threshold=0.5")
    assert status == 200
    assert _wait(server, resp["query_id"]) == "SUCCEEDED"


def test_chunk_geometry_params(server):
    from ensembl_lakehouse_spark.operators import chunking as C

    assert PARAM_SPECS["chunk_documents"]["width"].default == C.CHUNK_W
    assert resolve_params("chunk_documents", {"width": "128", "stride": "96"}) == {
        "width": 128, "stride": 96,
    }
    # stride > width would drop tokens between windows: fail closed
    with pytest.raises(ParamError):
        resolve_params("chunk_documents", {"stride": "200", "width": "100"})
    status, resp = _get(server, "/analytics/chunk_documents?width=32&stride=32")
    assert status == 200
    assert _wait(server, resp["query_id"]) == "SUCCEEDED"
    status, err = _get(server, "/analytics/chunk_documents?stride=9000")
    assert status == 400


def test_pack_seq_len_param(server):
    from ensembl_lakehouse_spark.operators import chunking as C

    assert PARAM_SPECS["pack_sequences"]["seq_len"].default == C.SEQ_LEN
    status, resp = _get(server, "/analytics/pack_sequences?seq_len=128")
    assert status == 200
    assert _wait(server, resp["query_id"]) == "SUCCEEDED"


def test_embedding_threshold_params():
    assert PARAM_SPECS["dedup_embedding"]["threshold"].default == SIM.EMBED_DUP_THRESHOLD
    assert PARAM_SPECS["dedup_semantic"]["threshold"].default == SIM.SEMANTIC_THRESHOLD
    assert resolve_params("dedup_embedding", {"threshold": "0.9"}) == {
        "threshold": 0.9
    }
    with pytest.raises(ParamError):
        resolve_params("dedup_semantic", {"threshold": "2.0"})


def test_round5_param_specs_pinned():
    from ensembl_lakehouse_spark.operators import dedup as D
    from ensembl_lakehouse_spark.operators import relational as R
    from ensembl_lakehouse_spark.operators import text as T

    assert PARAM_SPECS["events_topk_per_hour"]["k"].default == R.TRENDING_K
    assert PARAM_SPECS["doc_jaccard_knn"]["k"].default == D.JKNN_K
    assert PARAM_SPECS["cooccur_pmi"]["top_n"].default == T.COOCCUR_TOP_N
    # explicit default collapses onto the bare key; overrides don't
    assert resolve_params("doc_jaccard_knn", {"k": str(D.JKNN_K)}) == {}
    assert resolve_params("doc_jaccard_knn", {"k": "7"}) == {"k": 7}


def test_round5_k_override_end_to_end(server):
    import json as _json
    import urllib.request as _rq

    def get(path):
        with _rq.urlopen(f"http://127.0.0.1:{server.port}{path}") as r:
            return _json.loads(r.read())

    resp = get("/analytics/events_topk_per_hour?k=1")
    qid = resp["query_id"]
    import time as _t

    deadline = _t.time() + 120
    while _t.time() < deadline:
        st = get(f"/query/{qid}/status")
        if st["status"] in ("SUCCEEDED", "FAILED"):
            break
        _t.sleep(0.3)
    assert st["status"] == "SUCCEEDED"
    prev = get(f"/query/{qid}/preview?maxResults=1000")
    ranks = {
        r["Data"][1]["VarCharValue"] for r in prev["Rows"][1:]
    }
    assert ranks == {"1"}


def test_round5_cont_param_specs_pinned():
    """Report-pack / events / graph param defaults pinned to the
    operator keyword defaults (same contract as the earlier specs)."""
    from ensembl_lakehouse_spark.operators import graph as G
    from ensembl_lakehouse_spark.operators import relational as R
    from ensembl_lakehouse_spark.operators import reports as RP

    assert (
        PARAM_SPECS["orders_rfm_segments"]["quantiles"].default
        == RP.RFM_QUANTILES
    )
    assert PARAM_SPECS["target_encoding"]["prior"].default == RP.TE_PRIOR
    assert PARAM_SPECS["feature_bin_lift"]["bin_width"].default == RP.BIN_WIDTH
    assert (
        PARAM_SPECS["events_level_shift"]["window"].default == R.SHIFT_WINDOW
    )
    assert (
        PARAM_SPECS["session_concurrency"]["gap_minutes"].default
        == R.SESSION_GAP_MIN
    )
    assert (
        PARAM_SPECS["graph_link_predict"]["top_n"].default
        == G.LINKPRED_TOP_N
    )
    assert resolve_params("target_encoding", {"prior": "20"}) == {}
    assert resolve_params("target_encoding", {"prior": "0"}) == {"prior": 0}
    with pytest.raises(ParamError):
        resolve_params("orders_rfm_segments", {"quantiles": "1"})


def test_round5_cont_overrides_change_results(spark):
    """Parameter overrides actually change the computation: prior=0
    target encoding returns raw category means; a coarser RFM
    quantile count shrinks the segment lattice; a custom link-predict
    top_n truncates the ranking."""
    from ensembl_lakehouse_spark.operators import graph as G
    from ensembl_lakehouse_spark.operators import reports as RP

    sf = "/root/testdata/sf0.001"
    enc_smooth = {
        (r["c_mktsegment"], r["c_nationkey"]): r["enc_cents"]
        for r in RP.target_encoding(spark, sf).collect()
    }
    raw = RP.target_encoding(spark, sf, prior=0).collect()
    assert {
        (r["c_mktsegment"], r["c_nationkey"]): r["sum_cents"] // r["n_orders"]
        for r in raw
    } == {
        (r["c_mktsegment"], r["c_nationkey"]): r["enc_cents"] for r in raw
    }
    assert any(
        enc_smooth[(r["c_mktsegment"], r["c_nationkey"])] != r["enc_cents"]
        for r in raw
    )
    seg2 = RP.orders_rfm_segments(spark, sf, quantiles=2).collect()
    assert seg2 and all(
        r["r_q"] <= 2 and r["f_q"] <= 2 and r["m_q"] <= 2 for r in seg2
    )
    top5 = G.graph_link_predict(spark, sf, top_n=5).collect()
    assert len(top5) == 5
