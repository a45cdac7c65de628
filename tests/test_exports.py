"""Round-trip coverage for every export format (SURVEY §2 S5-S11)
plus the C6 FAILED-throttle state machine — the r1 verdict's
untested components (S6 tsv, S8 json, S9 xml, S10 feather, S7 xlsx,
C6)."""

from __future__ import annotations

import glob
import json
import os
import xml.etree.ElementTree as ET
import zipfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ensembl_lakehouse_spark.service import export as X
from ensembl_lakehouse_spark.service.cache import FAILED_EXPORT_RETRY_SECONDS, KVCache
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def result_df(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/region.parquet")
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
    )


@pytest.fixture(scope="module")
def expected(result_df):
    return [(r.r_regionkey, r.r_name) for r in result_df.collect()]


def _read_csv_dir(path: str, sep: str) -> list[tuple[int, str]]:
    frames = [pd.read_csv(p, sep=sep) for p in sorted(glob.glob(f"{path}/part-*"))]
    pdf = pd.concat(frames)
    return sorted((int(a), b) for a, b in zip(pdf.r_regionkey, pdf.r_name))


def test_tsv_roundtrip(result_df, expected, tmp_path):
    path = str(tmp_path / "out.tsv")
    X.write_export(result_df, path, "tsv")
    assert _read_csv_dir(path, "\t") == expected


def test_csv_roundtrip(result_df, expected, tmp_path):
    path = str(tmp_path / "out.csv")
    X.write_export(result_df, path, "csv")
    assert _read_csv_dir(path, ",") == expected


def test_json_roundtrip(result_df, expected, tmp_path):
    path = str(tmp_path / "out.json")
    X.write_export(result_df, path, "json")
    rows = []
    for p in sorted(glob.glob(f"{path}/part-*")):
        with open(p) as fh:
            rows += [json.loads(line) for line in fh if line.strip()]
    assert sorted((r["r_regionkey"], r["r_name"]) for r in rows) == expected


def test_feather_roundtrip(result_df, expected, tmp_path):
    path = str(tmp_path / "out.feather")
    X.write_export(result_df, path, "feather")
    pdf = pd.read_feather(path)
    assert sorted(zip(pdf.r_regionkey, pdf.r_name)) == expected
    assert pdf.r_regionkey.dtype == "int32"  # typed end-to-end, no CSV hop


def test_xml_roundtrip(result_df, expected, tmp_path):
    path = str(tmp_path / "out.xml")
    X.write_export(result_df, path, "xml")
    root = ET.parse(path).getroot()
    rows = [
        (int(row.findtext("r_regionkey")), row.findtext("r_name"))
        for row in root.findall("row")
    ]
    assert sorted(rows) == expected


def test_xlsx_roundtrip(result_df, expected, tmp_path):
    """openpyxl is absent here, so this exercises the vendored
    std-lib OOXML writer: the artifact must be a valid zip with the
    expected parts and cell values."""
    path = str(tmp_path / "out.xlsx")
    X.write_export(result_df, path, "xlsx")
    with zipfile.ZipFile(path) as zf:
        names = set(zf.namelist())
        assert {"[Content_Types].xml", "xl/workbook.xml", "xl/worksheets/sheet1.xml"} <= names
        sheet = zf.read("xl/worksheets/sheet1.xml").decode()
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    root = ET.fromstring(sheet)
    rows = root.findall(".//m:row", ns)
    header = [t.text for t in rows[0].findall(".//m:t", ns)]
    assert header == ["r_regionkey", "r_name"]
    got = []
    for row in rows[1:]:
        cells = row.findall("m:c", ns)
        got.append((int(cells[0].findtext("m:v", namespaces=ns)), cells[1].findtext(".//m:t", namespaces=ns)))
    assert sorted(got) == expected


def test_parquet_keeps_schema(result_df, tmp_path, spark):
    path = str(tmp_path / "out.parquet")
    X.write_export(result_df, path, "parquet")
    assert spark.read.parquet(path).schema == result_df.schema


def test_failed_export_throttle(result_df, tmp_path):
    """C6: a failing conversion sets FAILED with a 60 s TTL; until
    the injected clock passes it, re-requests report FAILED; after,
    the export is re-enqueued (reference app/main.py:344-355)."""
    now = [1000.0]
    cache = KVCache(clock=lambda: now[0])
    mgr = X.ExportManager(str(tmp_path / "exp"), cache=cache, max_workers=1)

    broken = result_df.withColumn("boom", F.expr("raise_error('injected failure')"))
    assert mgr.request_export("q1", broken, "csv", "SUCCEEDED")["status"] == X.EXPORT_QUEUED
    mgr.wait_all()
    resp = mgr.request_export("q1", broken, "csv", "SUCCEEDED")
    assert resp["status"] == X.EXPORT_FAILED
    assert "one minute" in resp["detail"]

    now[0] += FAILED_EXPORT_RETRY_SECONDS + 1  # throttle expires
    resp = mgr.request_export("q1", result_df, "csv", "SUCCEEDED")
    assert resp["status"] == X.EXPORT_QUEUED
    mgr.wait_all()
    assert mgr.request_export("q1", result_df, "csv", "SUCCEEDED")["status"] == X.EXPORT_DONE


def test_wait_all_preserves_pool_size(tmp_path):
    mgr = X.ExportManager(str(tmp_path / "exp"), max_workers=5)
    mgr.wait_all()
    assert mgr._pool._max_workers == 5


def test_json_split_byte_compatible(result_df, tmp_path):
    """json_orient="split" reproduces the reference's export bytes
    (app/tasks.py:23 does ``df.to_json(path, orient="split")``): the
    file must equal pandas' own serialization of the same frame."""
    path = str(tmp_path / "out_split.json")
    X.write_export(result_df, path, "json", json_orient="split")
    with open(path, "rb") as fh:
        got = fh.read()
    import io
    buf = io.StringIO()
    result_df.toPandas().to_json(buf, orient="split")
    assert got == buf.getvalue().encode()
    doc = json.loads(got)
    assert set(doc) == {"columns", "index", "data"}
    assert doc["columns"] == ["r_regionkey", "r_name"]


def test_json_split_via_manager(result_df, tmp_path):
    mgr = X.ExportManager(str(tmp_path / "exp"), json_orient="split")
    out = mgr.request_export("q1", result_df, "json", "SUCCEEDED")
    assert out["status"] in (X.EXPORT_QUEUED, X.EXPORT_DONE)
    mgr.wait_all()
    out = mgr.request_export("q1", result_df, "json", "SUCCEEDED")
    assert out["status"] == X.EXPORT_DONE
    with open(out["result"]) as fh:
        doc = json.load(fh)
    assert set(doc) == {"columns", "index", "data"}


def test_orc_roundtrip_keeps_schema(result_df, expected, tmp_path, spark):
    """EXT format: ORC is the second columnar sink (native distributed
    writer, jars ship with Spark). Round-trip must preserve schema and
    values exactly like parquet."""
    path = str(tmp_path / "out.orc")
    X.write_export(result_df, path, "orc")
    back = spark.read.orc(path)
    assert back.schema == result_df.schema
    assert sorted((r.r_regionkey, r.r_name) for r in back.collect()) == expected


def test_runtime_failure_leaves_no_servable_artifact(result_df, tmp_path):
    """Spark creates the output dir at write START; a RUNTIME failure
    mid-write must not be served as DONE by the head-check (the state
    machine wins while state exists, and the partial dir is removed
    so the post-TTL no-state path cannot resurrect it)."""
    now = [1000.0]
    cache = KVCache(clock=lambda: now[0])
    mgr = X.ExportManager(str(tmp_path / "exp"), cache=cache, max_workers=1)

    # data-dependent zero divisor: survives analysis/constant
    # folding, fails during the distributed write under ANSI
    broken = result_df.selectExpr(
        "r_regionkey", "r_regionkey DIV (r_regionkey - r_regionkey) AS boom"
    )
    mgr.request_export("q9", broken, "csv", "SUCCEEDED")
    mgr.wait_all()
    resp = mgr.request_export("q9", broken, "csv", "SUCCEEDED")
    assert resp["status"] == X.EXPORT_FAILED, resp
    # the partial directory was cleaned up
    assert not os.path.exists(mgr.artifact_path("q9", "csv"))
    # after the throttle, a good plan completes and serves correctly
    now[0] += FAILED_EXPORT_RETRY_SECONDS + 1
    mgr.request_export("q9", result_df, "csv", "SUCCEEDED")
    mgr.wait_all()
    resp = mgr.request_export("q9", result_df, "csv", "SUCCEEDED")
    assert resp["status"] == X.EXPORT_DONE
    assert os.path.exists(resp["result"])


def test_xml_fallback_sanitizes_invalid_tags(tmp_path):
    pdf = pd.DataFrame({"count(*)": [1], "ok col": ["x"], "9lives": [2]})
    path = str(tmp_path / "weird.xml")
    X._write_xml_fallback(pdf, path)
    root = ET.parse(path).getroot()  # must parse at all
    row = root.find("row")
    assert {c.tag for c in row} == {"count___", "ok_col", "_9lives"}
