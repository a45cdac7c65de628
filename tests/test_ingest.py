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


def test_sample_schema_multifile_headers(spark, tmp_path):
    """A multi-file csv dataset has one header line PER part file;
    inference must not swallow later files' headers as data rows
    (which would e.g. demote an int column to string)."""
    import ensembl_lakehouse_spark.sources.ingest as I

    d = tmp_path / "multi"
    d.mkdir()
    # Three part files, identical header, int + string columns.
    for i in range(3):
        (d / f"part-{i:05d}.csv").write_text(
            "k,name\n" + "".join(f"{j + i * 10},row{j}\n" for j in range(5))
        )
    schema = I.sample_schema(spark, str(d), "csv")
    assert [f.name for f in schema.fields] == ["k", "name"]
    # A header line parsed as data would force k to string.
    assert schema["k"].dataType.simpleString() in ("int", "bigint")
