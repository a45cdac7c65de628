"""End-to-end lifecycle tests: submit → status → preview → export.

Mirrors the reference's Postman collection flows
(ensembl_lakehouse.postman_collection.json) against the engine
facade.
"""

from __future__ import annotations

import os

import pytest

from ensembl_lakehouse_spark.query import QueryValidationError
from tests.conftest import SF_DIR
from ensembl_lakehouse_spark.service.jobs import (
    InvalidQueryId,
    QueryNotFound,
    SUCCEEDED,
    is_valid_query_id,
)


def test_data_types_lists_fixture_tables(engine):
    names = engine.data_types()
    assert "lineitem" in names and "orders" in names


def test_filters_shape(engine):
    out = engine.filters("lineitem")
    cols = {c["Name"]: c["Type"] for c in out["columns"]}
    assert cols["l_orderkey"] == "bigint"
    assert cols["l_returnflag"] == "string"
    # species-analog values for lineitem's key column l_returnflag
    assert set(out["species"]) == {"A", "N", "R"}


def test_result_file_formats(engine):
    # The reference's 7 formats first (app/constants.py:3-10), then
    # EXT additions (orc) — order preserved so a reference client
    # reading a prefix still sees its exact enum.
    assert engine.result_file_formats() == [
        "csv",
        "tsv",
        "xlsx",
        "json",
        "xml",
        "feather",
        "parquet",
        "orc",
    ]


def test_submit_status_preview_export_roundtrip(engine):
    resp = engine.submit_query(
        "lineitem",
        "R",
        fields="l_orderkey,l_extendedprice,l_returnflag",
        condition="l_quantity > 40",
    )
    qid = resp["query_id"]
    assert is_valid_query_id(qid)
    assert resp["_links"]["status"] == f"/query/{qid}/status"

    handle = engine.registry.wait(qid, timeout=120)
    assert handle.state == SUCCEEDED

    status = engine.query_status(qid)
    assert status["status"] == SUCCEEDED
    assert os.path.isdir(status["result"])

    prev = engine.query_preview(qid, max_results=5)
    rows = prev["Rows"]
    assert len(rows) <= 5
    header = [c["VarCharValue"] for c in rows[0]["Data"]]
    assert header == ["l_orderkey", "l_extendedprice", "l_returnflag"]
    # all data rows respect both filters
    for row in rows[1:]:
        assert row["Data"][2]["VarCharValue"] == "R"

    exp = engine.export(qid, "parquet")
    assert exp["status"] in ("QUEUED", "PROCESSING", "DONE")
    engine.exports.wait_all()
    exp2 = engine.export(qid, "parquet")
    assert exp2["status"] == "DONE"
    assert os.path.exists(exp2["result"])


def test_semantic_cache_hit_reuses_query_id(engine):
    a = engine.submit_query("lineitem", "R", condition="l_quantity > 40 AND l_discount < 0.05")
    b = engine.submit_query("lineitem", "R", condition="L_DISCOUNT < 0.05 and l_quantity > 40")
    assert a["query_id"] == b["query_id"]


def test_validation_errors(engine):
    with pytest.raises(QueryValidationError):
        engine.submit_query("lineitem", "R", fields="nonexistent_col")
    with pytest.raises(QueryValidationError):
        engine.submit_query("lineitem", "R", condition="l_quantity +")
    with pytest.raises(QueryValidationError):
        engine.submit_query("lineitem", "R", condition="l_quantity")  # not boolean
    with pytest.raises(QueryValidationError):
        engine.submit_query("", "R")
    with pytest.raises(KeyError):
        engine.submit_query("no_such_table", "R")


def test_query_id_error_mapping(engine):
    with pytest.raises(InvalidQueryId):
        engine.query_status("not-a-uuid")
    with pytest.raises(QueryNotFound):
        engine.query_status("00000000-0000-0000-0000-000000000000")


def test_cancel_lifecycle(engine):
    """J2's fifth state: cancel maps onto cancelJobGroup; a
    CANCELLED query reports CANCELLED and refuses export (the
    reference's export gate requires SUCCEEDED, app/main.py:326)."""
    from ensembl_lakehouse_spark.service.export import QueryNotSucceeded

    resp = engine.submit_query("lineitem", "A", condition="l_quantity > 10")
    qid = resp["query_id"]
    engine.registry.cancel(qid)
    engine.registry.wait(qid, timeout=120)
    status = engine.query_status(qid)
    # Cancellation races materialization on tiny fixtures: either it
    # landed (CANCELLED) or the job finished first (SUCCEEDED) —
    # both legal; CANCELLED must then refuse export.
    assert status["status"] in ("CANCELLED", "SUCCEEDED")
    if status["status"] == "CANCELLED":
        with pytest.raises(QueryNotSucceeded):
            engine.export(qid, "csv")


def test_concurrent_submissions_all_succeed(engine):
    """The async registry under parallel load: 8 distinct queries
    submitted from 8 threads at once must each reach SUCCEEDED with
    a non-empty result, with 8 distinct query ids (no id collision,
    no cross-talk between jobs sharing the SparkSession)."""
    from concurrent.futures import ThreadPoolExecutor

    conditions = [f"l_quantity > {q}" for q in range(40, 48)]

    def submit(cond):
        resp = engine.submit_query(
            "lineitem", "R", fields="l_orderkey,l_quantity", condition=cond
        )
        return resp["query_id"]

    with ThreadPoolExecutor(max_workers=8) as pool:
        qids = list(pool.map(submit, conditions))

    assert len(set(qids)) == len(conditions)
    for qid in qids:
        engine.registry.wait(qid, timeout=180)
        st = engine.query_status(qid)
        assert st["status"] == SUCCEEDED, (qid, st)
    # results differ across jobs (no cross-talk): stricter condition
    # must never return MORE rows
    counts = [
        len(engine.query_preview(qid, max_results=1000)["Rows"]) for qid in qids
    ]
    assert counts == sorted(counts, reverse=True), counts


def test_named_analytics_through_full_lifecycle(engine):
    """Any operator-library query runs through submit/status/preview/
    export with semantic caching — the service-layer integration of
    the analytics registry."""
    resp = engine.submit_analytics("bm25_search", SF_DIR)
    qid = resp["query_id"]
    assert resp["_links"]["status"] == f"/query/{qid}/status"
    engine.registry.wait(qid, timeout=180)
    status = engine.query_status(qid)
    assert status["status"] == "SUCCEEDED"
    assert "result_url" in status
    prev = engine.query_preview(qid, max_results=5)
    header = [c["VarCharValue"] for c in prev["Rows"][0]["Data"]]
    assert header == ["doc_id", "n_terms_matched", "score_fp", "score"]
    # repeat submission: semantic-cache hit returns the SAME query id
    assert engine.submit_analytics("bm25_search", SF_DIR)["query_id"] == qid
    out = engine.export(qid, "parquet")
    engine.exports.wait_all()
    out = engine.export(qid, "parquet")
    assert out["status"] == "DONE"


def test_named_analytics_rejects_unknown(engine):
    assert "bm25_search" in engine.analytics_names()
    with pytest.raises(QueryValidationError):
        engine.submit_analytics("no_such_query", SF_DIR)


def test_analytics_cache_keys_do_not_collide_across_dirs(engine):
    """Distinct sf_dir paths must never share a semantic-cache entry
    (the key embeds the path verbatim, not through the projection
    canonicalizer which case-folds and splits on commas)."""
    a = engine.submit_analytics("scan_project", SF_DIR)["query_id"]
    b = engine.submit_analytics("scan_project", "/root/testdata/sf0.01")["query_id"]
    assert a != b
    # same dir again: cache hit
    assert engine.submit_analytics("scan_project", SF_DIR)["query_id"] == a
    engine.registry.wait(a, timeout=120)
    engine.registry.wait(b, timeout=120)


def test_submit_sql_runs_read_only_queries(engine):
    """Raw SQL through the lifecycle: a SELECT (incl. CTE form) runs
    to SUCCEEDED; repeat submission is a semantic-cache hit on the
    whitespace/case-canonicalized text."""
    resp = engine.submit_sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    qid = resp["query_id"]
    engine.registry.wait(qid, timeout=120)
    assert engine.query_status(qid)["status"] == "SUCCEEDED"
    prev = engine.query_preview(qid, max_results=10)
    assert [c["VarCharValue"] for c in prev["Rows"][0]["Data"]] == [
        "l_returnflag", "n",
    ]
    again = engine.submit_sql(
        "select   l_returnflag, count(*) AS n from LINEITEM "
        "group by l_returnflag ORDER BY l_returnflag"
    )
    assert again["query_id"] == qid

    cte = engine.submit_sql(
        "WITH r AS (SELECT * FROM lineitem WHERE l_returnflag = 'R') "
        "SELECT COUNT(*) AS n FROM r"
    )
    engine.registry.wait(cte["query_id"], timeout=120)
    assert engine.query_status(cte["query_id"])["status"] == "SUCCEEDED"


def test_submit_sql_refuses_ddl_dml_and_garbage(engine):
    for bad in (
        "DROP TABLE lineitem",
        "CREATE TABLE t (a INT)",
        "INSERT INTO lineitem VALUES (1)",
        "SET spark.sql.shuffle.partitions=1",
        "EXPLAIN SELECT 1",
        "not sql at all",
        "",
        "SELECT no_such_col FROM lineitem",
    ):
        with pytest.raises(QueryValidationError):
            engine.submit_sql(bad)
    # the registered views are untouched
    assert "lineitem" in engine.data_types()


def test_submit_sql_fuzz_never_side_effects(engine):
    """Property: for ANY statement string, submit_sql either raises
    QueryValidationError or returns a query id — and the catalog's
    table set is unchanged either way. Drives the parser gate with
    mutation-shaped and garbage inputs, including whitespace/case
    disguises."""
    before = set(engine.data_types())
    attempts = [
        "drop table lineitem",
        "  DROP   TABLE   lineitem  ",
        "DrOp TaBlE lineitem",
        "create or replace view v1 as select 1",
        "alter table lineitem add column zzz int",
        "truncate table lineitem",
        "delete from lineitem",
        "update lineitem set l_quantity = 0",
        "merge into lineitem using lineitem b on false when matched then delete",
        "insert overwrite table lineitem select * from lineitem",
        "cache table lineitem",
        "refresh table lineitem",
        "analyze table lineitem compute statistics",
        "set spark.sql.ansi.enabled=false",
        "show tables",
        "describe lineitem",
        "use default",
        "select 1; drop table lineitem",
        "with x as (select 1) insert into lineitem select * from x",
        "')' union select * from lineitem --",
        "\x00\x01garbage",
        "SELECT * FROM lineitem LIMIT 1",  # the one legal entry
    ]
    ok = 0
    for stmt in attempts:
        try:
            resp = engine.submit_sql(stmt)
            ok += 1
            engine.registry.wait(resp["query_id"], timeout=120)
        except QueryValidationError:
            pass
    assert ok == 1  # only the plain SELECT passed
    assert set(engine.data_types()) == before
    # the data itself is intact
    n = engine.submit_sql("SELECT COUNT(*) AS n FROM lineitem")
    engine.registry.wait(n["query_id"], timeout=120)
    prev = engine.query_preview(n["query_id"], max_results=2)
    assert int(prev["Rows"][1]["Data"][0]["VarCharValue"]) > 0


def test_failed_query_does_not_poison_semantic_cache(engine, spark):
    """A FAILED job evicts its cache entry: resubmission runs fresh
    instead of serving the failed id for the 44-day TTL."""
    broken = spark.range(3).selectExpr("id DIV (id - id) AS boom")
    qid1 = engine.registry.submit(broken, cache_key="poison-test")
    engine.registry.wait(qid1, timeout=120)
    assert engine.query_status(qid1)["status"] == "FAILED"
    assert engine.registry.cached_query_id("poison-test") is None
    qid2 = engine.registry.submit(spark.range(3), cache_key="poison-test")
    assert qid2 != qid1
    engine.registry.wait(qid2, timeout=120)
    assert engine.query_status(qid2)["status"] == "SUCCEEDED"


def test_submit_sql_literal_case_not_collided(engine):
    """'R' and 'r' in string literals are different queries: the
    cache key folds case OUTSIDE quotes only."""
    a = engine.submit_sql(
        "SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag = 'R'"
    )["query_id"]
    b = engine.submit_sql(
        "SELECT COUNT(*) AS n FROM lineitem WHERE l_returnflag = 'r'"
    )["query_id"]
    assert a != b
    # keyword/identifier case + whitespace DO fold
    c = engine.submit_sql(
        "select  count(*) AS n FROM LINEITEM where l_returnflag='R'"
    )["query_id"]
    assert c != b  # sanity: not colliding with the 'r' one
    engine.registry.wait(a, timeout=120)
    engine.registry.wait(b, timeout=120)


def test_raw_sql_over_registered_snapshot(engine, spark, tmp_path):
    """The versioned lakehouse layer through the service: commit a
    snapshot table, register it, query it (joined to a fixture
    table) via submit_sql; re-register after a merge advances the
    view; version pin time-travels."""
    from ensembl_lakehouse_spark import snapshots as SN

    tdir = str(tmp_path / "curated_docs")
    base = spark.createDataFrame(
        [(1, "en"), (2, "fr"), (3, "en")], ["doc_id", "lang"]
    )
    SN.write_snapshot(tdir, base)
    engine.catalog.register_snapshot("curated_docs", tdir)
    resp = engine.submit_sql(
        "SELECT c.lang, COUNT(*) AS n FROM curated_docs c "
        "JOIN documents d ON c.doc_id = d.doc_id GROUP BY c.lang ORDER BY c.lang"
    )
    engine.registry.wait(resp["query_id"], timeout=120)
    assert engine.query_status(resp["query_id"])["status"] == "SUCCEEDED"

    SN.merge_snapshot(
        spark, tdir,
        spark.createDataFrame([(4, "de")], ["doc_id", "lang"]), key="doc_id",
    )
    # registered view is snapshot-isolated until re-registration
    assert engine.spark.table("curated_docs").count() == 3
    engine.catalog.register_snapshot("curated_docs", tdir)
    assert engine.spark.table("curated_docs").count() == 4
    engine.catalog.register_snapshot("curated_docs", tdir, version=0)
    assert engine.spark.table("curated_docs").count() == 3


def test_sql_cache_misses_after_snapshot_reregistration(engine, spark, tmp_path):
    """Review regression: identical SQL after advancing a registered
    snapshot must produce a NEW query id — the old cache entry keyed
    the old view state (serving it would return pre-advance rows for
    the 44-day TTL)."""
    from ensembl_lakehouse_spark import snapshots as SN

    tdir = str(tmp_path / "reg_cache")
    SN.write_snapshot(
        tdir, spark.createDataFrame([(1,), (2,)], ["k"])
    )
    engine.catalog.register_snapshot("reg_cache_t", tdir)
    sql = "SELECT COUNT(*) AS n FROM reg_cache_t"
    first = engine.submit_sql(sql)["query_id"]
    engine.registry.wait(first, timeout=120)
    # same view state: cache hit
    assert engine.submit_sql(sql)["query_id"] == first

    SN.merge_snapshot(
        spark, tdir, spark.createDataFrame([(3,)], ["k"]), key="k"
    )
    engine.catalog.register_snapshot("reg_cache_t", tdir)
    second = engine.submit_sql(sql)["query_id"]
    assert second != first
    engine.registry.wait(second, timeout=120)
    prev = engine.query_preview(second, max_results=3)
    assert prev["Rows"][1]["Data"][0]["VarCharValue"] == "3"


def test_broken_snapshot_registration_only_breaks_its_own_view(spark, tmp_path):
    """r7 ADVICE (engine.py:567): a registered table whose current
    manifest is unreadable must not fail /sql statements that never
    reference it — its snap_ view is dropped so only statements
    binding it fail (400 at analysis), and the break joins the view
    fingerprint so cached results cannot straddle a repair."""
    import pytest as _pytest

    from ensembl_lakehouse_spark import snapshots as SN
    from ensembl_lakehouse_spark.engine import Engine, QueryValidationError

    eng = Engine(spark, work_dir=str(tmp_path / "work"))
    try:
        tdir = str(tmp_path / "tbl")
        SN.write_snapshot(
            tdir, spark.createDataFrame([(1,)], ["k"]).coalesce(1)
        )
        eng.register_snapshot_table("brk", tdir)
        SN._commit(tdir, [], "truncate", None, 0, {}, {})  # empty v1
        # statements that never touch the broken view run fine
        out = eng.submit_sql("SELECT 1 AS one")
        eng.registry.wait(out["query_id"], timeout=60)
        # statements binding the dropped view fail at analysis (400)
        with _pytest.raises(QueryValidationError, match="does not bind"):
            eng.submit_sql("SELECT COUNT(*) AS n FROM snap_brk")
        # a PINNED read of the healthy version still works
        out = eng.submit_sql(
            "SELECT COUNT(*) AS n FROM snap_brk", "brk:0"
        )
        eng.registry.wait(out["query_id"], timeout=60)
        # and a bad pin blames snap_versions explicitly
        with _pytest.raises(QueryValidationError, match="snap_versions"):
            eng.submit_sql("SELECT 1 AS one", "brk:99")
    finally:
        eng.close()


def test_snap_versions_rejects_pin_past_published(spark, tmp_path):
    """r7 ADVICE (medium, engine.py:247): when a publish pointer
    exists, snap_versions pins beyond it are refused — a staged
    (written-not-yet-published) version must not leak through /sql
    any more than through /aggregate. Historical pins at or below
    the pointer stay valid."""
    import pytest as _pytest

    from ensembl_lakehouse_spark import snapshots as SN
    from ensembl_lakehouse_spark.engine import Engine, QueryValidationError

    eng = Engine(spark, work_dir=str(tmp_path / "work"))
    try:
        tdir = str(tmp_path / "tbl")
        SN.write_snapshot(
            tdir, spark.createDataFrame([(1,)], ["k"]).coalesce(1)
        )
        SN.publish_snapshot(tdir)  # published = v0
        SN.merge_snapshot(  # v1: staged, beyond the pointer
            spark, tdir, spark.createDataFrame([(2,)], ["k"]), key="k"
        )
        eng.register_snapshot_table("fence", tdir)
        # pin at the published version is fine
        out = eng.submit_sql(
            "SELECT COUNT(*) AS n FROM snap_fence", "fence:0"
        )
        eng.registry.wait(out["query_id"], timeout=60)
        # pin past it is a 400 naming the fence — even for a
        # statement that never reads the table (fail at validation)
        with _pytest.raises(QueryValidationError, match="published"):
            eng.submit_sql("SELECT 1 AS one", "fence:1")
    finally:
        eng.close()
