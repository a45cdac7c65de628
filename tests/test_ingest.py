"""Export→ingest round-trips: every distributed text export format
(csv/tsv/json-lines) must read back as a TYPED DataFrame equal to
the original, with the schema passed explicitly (never inferred —
sources/ingest.py's 100 TB rule)."""

from __future__ import annotations

import pytest

from ensembl_lakehouse_spark.service.export import write_export
from ensembl_lakehouse_spark.sources import ingest as I
from ensembl_lakehouse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def sample_df(spark):
    return (
        load_table(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


@pytest.mark.parametrize("fmt", ["csv", "tsv", "json"])
def test_text_roundtrip_typed(spark, tmp_path_factory, sample_df, fmt):
    path = str(tmp_path_factory.mktemp("ingest") / fmt)
    write_export(sample_df, path, fmt)
    back = I.read_table(spark, path, fmt, sample_df.schema)
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in sample_df.schema.fields
    ]
    orig = {tuple(r) for r in sample_df.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig


def test_sample_schema_is_bounded_inference(spark, tmp_path_factory, sample_df):
    path = str(tmp_path_factory.mktemp("ingest") / "csv_infer")
    write_export(sample_df, path, "csv")
    inferred = I.sample_schema(spark, path, "csv", sample_rows=50)
    assert set(f.name for f in inferred.fields) == set(sample_df.columns)


def test_corrupt_rows_are_counted_not_fatal(spark, tmp_path):
    """PERMISSIVE mode: a malformed JSON line lands in
    _corrupt_record instead of failing the read."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = tmp_path / "feed"
    p.mkdir()
    (p / "part-0.json").write_text(
        '{"id": 1, "name": "ok"}\n{not json at all}\n{"id": 2, "name": "fine"}\n'
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = I.read_table(spark, str(p), "json", schema)
    assert I.corrupt_count(df) == 1
    assert df.where("id is not null").count() == 2
