"""Typed ingestion sources: CSV / TSV / JSON-lines → DataFrame.

The reference's lake is parquet-only on the read side (SURVEY §2
S1; the CSV it touches is only its own Athena *result* files,
app/tasks.py:19), but a lakehouse engine is fed from whatever lands
— exports, vendor drops, API dumps. This module is the read-side
twin of service/export.py's writers, so every distributed export
format round-trips back to a typed DataFrame:

    write_export(df, p, "csv") → read_table(spark, p, "csv", df.schema)

Design rules (all about 100 TB behavior):

- **Schema is explicit, never inferred.** ``inferSchema``/JSON
  schema inference reads the ENTIRE input once before the real scan
  — a full extra pass at lake scale, and it can still guess wrong
  (a column of ints that later grows a decimal). Callers pass a
  StructType (typically from the catalog or the exporting query).
  For exploration, :func:`sample_schema` infers from a bounded
  sample and says so.
- **Malformed rows are a policy, not a crash**: PERMISSIVE with a
  ``_corrupt_record`` column by default (count them, quarantine
  them), FAILFAST opt-in for contract feeds.
- Text sources split by newline, so they parallelize like parquet
  (one task per split); gzip'd text does NOT split — documented
  here because it's the most common silent single-task bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TEXT_FORMATS = ("csv", "tsv", "json")


def read_table(
    spark: SparkSession,
    path: str,
    file_format: str,
    schema: StructType,
    *,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Read a csv/tsv/json-lines dataset with an explicit schema.

    Mirrors service/export.write_export's distributed writers
    option-for-option (header on csv/tsv, tab separator on tsv,
    JSON-lines for json) so export→ingest round-trips are
    type-exact.
    """
    if file_format not in TEXT_FORMATS:
        raise ValueError(f"file_format must be one of {TEXT_FORMATS}, got {file_format!r}")
    if file_format == "json":
        return spark.read.schema(schema).option("mode", mode).json(path)
    reader = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", mode)
        # Spark writes timestamps with microsecond precision; accept
        # both second- and sub-second forms on read.
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
    )
    if file_format == "tsv":
        reader = reader.option("sep", "\t")
    return reader.csv(path)


def _first_part_file(spark: SparkSession, path: str) -> str:
    """Resolve a dataset path to its lexicographically-first data file.

    A multi-file text dataset (a directory of part files) carries one
    header line PER FILE for csv/tsv, and ``limit(n)`` over the whole
    directory neither guarantees which file contributes the first
    line nor keeps later files' headers out of the sample — mid-file
    header lines would be parsed as data rows and skew inference.
    Sampling exactly one file sidesteps both; part files of one
    dataset share a schema by construction, so one file is a valid
    sample frame. Uses the Hadoop FileSystem API so any scheme the
    session can read (file://, s3a://, hdfs://) resolves the same way.
    """
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.getFileStatus(hpath).isFile():
        return path
    parts = sorted(
        str(s.getPath())
        for s in fs.listStatus(hpath)
        if s.isFile() and not s.getPath().getName().startswith(("_", "."))
    )
    if not parts:
        raise FileNotFoundError(f"no data files under {path}")
    return parts[0]


def sample_schema(
    spark: SparkSession, path: str, file_format: str, sample_rows: int = 10_000
) -> StructType:
    """Infer a schema from a BOUNDED sample — the exploration path.

    Unlike ``inferSchema=true`` (which scans everything), this reads
    ``sample_rows`` rows from the dataset's FIRST data file, infers
    from that, and returns the StructType for the caller to
    review/pin. One file, not the directory: see
    :func:`_first_part_file` for why multi-file sampling corrupts
    header handling. Production feeds should commit the reviewed
    schema into code/catalog, not re-infer per run.
    """
    if file_format not in TEXT_FORMATS:
        raise ValueError(f"file_format must be one of {TEXT_FORMATS}, got {file_format!r}")
    one_file = _first_part_file(spark, path)
    if file_format == "json":
        sampled = spark.read.text(one_file).limit(sample_rows)
        return spark.read.json(sampled.rdd.map(lambda r: r[0])).schema
    reader = spark.read.option("header", True).option("inferSchema", True)
    if file_format == "tsv":
        reader = reader.option("sep", "\t")
    # limit() the text first so inference cost is bounded by the
    # sample, not the file.
    import tempfile

    sampled = spark.read.text(one_file).limit(sample_rows)
    with tempfile.TemporaryDirectory() as d:
        sampled.coalesce(1).write.mode("overwrite").text(d + "/s")
        return reader.csv(d + "/s").schema


def corrupt_count(df: DataFrame) -> int:
    """How many rows failed the schema in PERMISSIVE mode (requires
    the schema to carry a ``_corrupt_record`` string column).

    Spark refuses queries that reference ONLY the internal corrupt
    column on a raw text read (SPARK-21610); materializing the
    parsed rows first (cache) is the documented pattern.
    """
    if "_corrupt_record" not in df.columns:
        return 0
    df = df.cache()
    try:
        return df.where(df["_corrupt_record"].isNotNull()).count()
    finally:
        df.unpersist()
