"""Restart durability of the warehouse catalog (warehouse.py).

The reference's schema system survives process restarts because it
lives in Glue (reference app/constants.py:12-13). These tests prove
the Spark twin does too: a WRITER process ``saveAsTable``s fixture
tables into a Derby-metastore warehouse and exits; a READER process —
a brand-new JVM with no registration code — serves table names,
schema, key values, and row counts purely from the metastore.

Writer and reader run as separate OS processes (``subprocess``), not
two sessions in one JVM: embedded Derby is single-JVM, and a genuine
restart is the thing under test. The session-scoped pytest Spark
fixture is NOT used here for the same reason.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

_WRITER = """
import json, sys
sys.path.insert(0, {repo!r})
from ensembl_lakehouse_spark.warehouse import warehouse_session, persist_fixture_tables
spark = warehouse_session(app_name="wh-writer", warehouse_dir={wh!r}, metastore_dir={ms!r})
written = persist_fixture_tables(spark, {sf!r}, tables=("region", "nation", "documents"))
spark.stop()
print("RESULT:" + json.dumps(written))
"""

_READER = """
import json, sys
sys.path.insert(0, {repo!r})
from ensembl_lakehouse_spark.warehouse import warehouse_session, persistent_tables
from ensembl_lakehouse_spark.catalog import Catalog
spark = warehouse_session(app_name="wh-reader", warehouse_dir={wh!r}, metastore_dir={ms!r})
# No registration of any kind: everything below must come from the metastore.
cat = Catalog(spark)
out = {{
    "tables": persistent_tables(spark),
    "data_types": cat.list_data_types(),
    "doc_schema": [c.as_reference_shape() for c in cat.describe_table("documents")],
    "doc_langs": cat.list_key_values("documents"),
    "region_rows": spark.table("region").count(),
    "pruned_plan": spark.table("documents").filter("lang = 'en'")
        ._jdf.queryExecution().executedPlan().toString()[:4000],
}}
spark.stop()
print("RESULT:" + json.dumps(out))
"""


def _run(script: str) -> dict | list:
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True, text=True, timeout=600, cwd=REPO,
    )
    assert proc.returncode == 0, f"subprocess failed:\n{proc.stdout}\n{proc.stderr}"
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT:")][-1]
    return json.loads(line[len("RESULT:"):])


@pytest.fixture(scope="module")
def warehouse(tmp_path_factory):
    base = tmp_path_factory.mktemp("wh")
    wh, ms = str(base / "warehouse"), str(base / "metastore")
    written = _run(_WRITER.format(repo=REPO, wh=wh, ms=ms, sf=SF_DIR))
    assert set(written) == {"region", "nation", "documents"}
    return wh, ms


def test_restart_survives_and_serves_metadata(warehouse):
    wh, ms = warehouse
    out = _run(_READER.format(repo=REPO, wh=wh, ms=ms))
    # Tables enumerate from the metastore in the fresh process.
    assert set(out["tables"]) >= {"region", "nation", "documents"}
    assert set(out["data_types"]) >= {"region", "nation", "documents"}
    # /filters/{data_type}-shaped schema (reference app/main.py:198).
    names = {c["Name"] for c in out["doc_schema"]}
    assert {"doc_id", "text", "lang", "source"} <= names
    # The mandatory-key listing (reference's SELECT DISTINCT species).
    assert out["doc_langs"], "expected at least one lang partition value"
    assert out["region_rows"] == 5
    # The key filter must prune partitions, not just filter rows: the
    # scan's partition filters mention lang (documents is partitioned
    # by the mandatory key column).
    assert "PartitionFilters" in out["pruned_plan"]
    plan_low = out["pruned_plan"].lower()
    assert "lang" in plan_low.split("partitionfilters", 1)[1][:200].lower()
