"""Multimodal-column operators (EXT X4): typed array / binary / map
columns as first-class citizens.

The reference's type surface is bigint+string only
(postman_collection.json:102); an LLM-data lake adds:

- ``array<float>`` embeddings (``embeddings.parquet`` fixture),
- opaque ``binary`` payloads (image/audio bytes) + typed metadata,
- ``map<string,string>`` property bags.

Operators here:

- :func:`multimodal_centroid` — per-label, per-dimension statistics
  of the embedding column in long form (label, dim, n, mean, min,
  max). **Float sums are made deterministic by fixed-point
  accumulation**: each component is floored to integer micro-units
  (``floor(x * 1e6)`` — IEEE multiply and floor are bit-identical
  across engines), summed as BIGINT (exact, associative, so the
  result is independent of Spark's partition-parallel reduction
  order), and divided back once at the end. This is the
  100 TB-safe pattern for aggregating float telemetry: a plain
  SUM(double) differs run-to-run under parallel reduction.
- :func:`multimodal_payload` — binary-column plumbing: byte length,
  content hash and head bytes of an opaque blob, plus map-typed
  metadata extraction. The blob is derived from ``documents.text``
  (utf-8 encode) because the fixture lake ships no raw media; the
  operator surface (BinaryType in, typed scalars out) is what a
  real image/audio column needs.
- :func:`decode_payloads` — the decode/feature-extract stage as a
  ``mapInPandas`` operator with a real Arrow batch signature. Media
  codecs (PIL/librosa/…) are not in this container, so the actual
  decode is pluggable: the default deterministic stub derives a
  fake (width, height, feature vector) from the payload's md5 — the
  Spark-side contract (schema, batching, partition-preserving
  parallelism) is real and tested in tests/test_multimodal.py.

Scale notes: centroid shuffles once on (label, dim) — cardinality
|labels|·DIM, tiny and uniform, with map-side partial aggregation;
payload/decode are map-only. ``decode_payloads`` is the one place
the engine legitimately crosses into Python: Arrow-batched columnar
transfer, never per-row UDF calls.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ensembl_lakehouse_spark.sources.tables import load_spread, load_table

#: Fixed-point scale for deterministic float aggregation (micro-units).
FP_SCALE = 1_000_000


def multimodal_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column, long form:
    (label, dim, n, dim_mean, dim_min, dim_max).

    posexplode keeps the dimension index (0-based); the groupBy key
    (label, dim) has |labels|·64 = 640 groups — partial aggregation
    reduces each task's output to ≤640 rows before the one shuffle,
    so the plan is scan-bound at any corpus size.
    """
    # spread reverted (r11 A/B): the exchange cost the fixture +0.48 s vs no-spread at sf0.1; map work here is too light to earn it
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x")
    ).withColumn("x_fp", F.floor(F.col("x").cast("double") * FP_SCALE))
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.count("*").alias("n"),
            F.sum("x_fp").alias("sum_fp"),
            F.min(F.col("x").cast("double")).alias("dim_min"),
            F.max(F.col("x").cast("double")).alias("dim_max"),
        )
        .select(
            "label",
            "dim",
            "n",
            ((F.col("sum_fp").cast("double") / FP_SCALE) / F.col("n")).alias("dim_mean"),
            "dim_min",
            "dim_max",
        )
    )


MULTIMODAL_CENTROID_SQL = f"""
WITH x AS (
  SELECT label, u.dim AS dim, u.val AS x,
         CAST(floor(u.val::DOUBLE * {FP_SCALE}) AS BIGINT) AS x_fp
  FROM (
    SELECT label,
           unnest(list_transform(range(0, len(embedding)),
             i -> {{'dim': i, 'val': embedding[i + 1]}})) AS u
    FROM embeddings)
)
SELECT label, dim, count(*) AS n,
       (CAST(sum(x_fp) AS DOUBLE) / {FP_SCALE}) / count(*) AS dim_mean,
       min(x::DOUBLE) AS dim_min,
       max(x::DOUBLE) AS dim_max
FROM x GROUP BY label, dim
"""


def multimodal_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization of the embedding column —
    the storage/serving compression step of a vector pipeline
    (store int8 + per-vector scale ≈ 4× smaller than float32).

    Per vector: ``scale = max(|x|) / 127``; each component becomes
    ``floor(x/scale + 0.5)`` (round-half-up via floor so Spark and
    DuckDB agree bit-for-bit — their native ``round`` half-rule
    differs); reported alongside the max absolute reconstruction
    error and the count of non-zero quantized components.

    Determinism: every float op here (abs, /, floor, *, -, max) is
    a pure IEEE-754 double op with no reduction-order freedom —
    ``array_max`` is order-independent — so the oracle matches
    exactly. All-zero vectors get scale 0 and an all-zero code.

    Map-only plan, zero shuffle: at 100 TB this is scan-bound and
    embarrassingly parallel, the same shape as the text operators.
    """
    emb = load_spread(spark, sf_dir, "embeddings", "vec_id")
    xd = F.transform("embedding", lambda x: x.cast("double"))
    df = emb.select(
        "vec_id",
        "label",
        xd.alias("xd"),
        (F.array_max(F.transform(xd, F.abs)) / F.lit(127.0)).alias("scale"),
    )
    q = F.when(F.col("scale") == 0.0, F.transform("xd", lambda x: F.lit(0))).otherwise(
        F.transform("xd", lambda x: F.floor(x / F.col("scale") + 0.5).cast("int"))
    )
    recon_err = F.when(F.col("scale") == 0.0, F.lit(0.0)).otherwise(
        F.array_max(
            F.transform(
                "xd",
                lambda x: F.abs(x - F.floor(x / F.col("scale") + 0.5) * F.col("scale")),
            )
        )
    )
    return df.select(
        "vec_id",
        "label",
        "scale",
        # codes as a canonical CSV string: array-typed result columns
        # don't survive the driver's pandas value-hash comparator
        F.concat_ws(",", F.transform(q, lambda v: v.cast("string"))).alias("q_csv"),
        F.size(F.filter(q, lambda v: v != 0)).alias("n_nonzero"),
        recon_err.alias("max_abs_err"),
    )


MULTIMODAL_QUANTIZE_SQL = """
WITH d AS (
  SELECT vec_id, label,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
  FROM embeddings
), q AS (
  SELECT vec_id, label, xd, scale,
         CASE WHEN scale = 0.0
              THEN list_transform(xd, x -> 0)
              ELSE list_transform(xd, x -> CAST(floor(x / scale + 0.5) AS INT))
         END AS q_int8
  FROM d
)
SELECT vec_id, label, scale,
       array_to_string(q_int8, ',') AS q_csv,
       len(list_filter(q_int8, v -> v != 0)) AS n_nonzero,
       CASE WHEN scale = 0.0 THEN 0.0
            ELSE list_max(list_transform(xd,
                 x -> abs(x - floor(x / scale + 0.5) * scale)))
       END AS max_abs_err
FROM q
"""


def multimodal_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary + map-metadata plumbing over ``documents``:
    utf-8 payload blob → byte length, content hash, head bytes;
    a map<string,string> props bag → extracted values.

    Hashing goes through the hex *string* of the blob because the
    DuckDB oracle's md5/substring are VARCHAR-only — same bytes
    compared, both engines uppercase hex. Map-only plan.
    """
    df = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
        ).alias("props"),
    )
    return df.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5(F.hex("payload")).alias("payload_md5"),
        F.substring(F.hex("payload"), 1, 16).alias("head_hex"),
        F.element_at("props", "lang").alias("prop_lang"),
        F.element_at("props", "source").alias("prop_source"),
    )


MULTIMODAL_PAYLOAD_SQL = """
WITH d AS (
  SELECT doc_id, encode(text) AS payload,
         MAP {'lang': lang, 'source': source} AS props
  FROM documents)
SELECT doc_id,
       octet_length(payload) AS n_bytes,
       md5(hex(payload)) AS payload_md5,
       substring(hex(payload), 1, 16) AS head_hex,
       props['lang'][1] AS prop_lang,
       props['source'][1] AS prop_source
FROM d
"""


# ---------------------------------------------------------------------------
# Decode stage (mapInPandas; pytest-verified, not oracle-expressible)
# ---------------------------------------------------------------------------

DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)

#: Feature-vector length produced by the decoder.
N_FEATURES = 8


def _stub_decode(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder: md5-derived (width, height,
    8-dim feature vector). Stands in for PIL/librosa which are not
    installed here; a real deployment passes its own ``decode_fn``
    with the identical signature."""
    h = hashlib.md5(payload).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feats = [round(b / 255.0, 6) for b in h[2 : 2 + N_FEATURES]]
    return width, height, feats


def decode_payloads(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    decode_fn: Callable[[bytes], tuple[int, int, list[float]]] | None = None,
) -> DataFrame:
    """Decode a binary column into typed media metadata + features
    via ``mapInPandas`` (Arrow-batched, partition-preserving — the
    idiomatic Spark shape for a Python media codec).

    ``decode_fn`` defaults to the deterministic stub; pass e.g. a
    PIL-backed callable in a real deployment. If you need an
    import-gated real decoder, raise NotImplementedError inside it —
    the operator plumbing does not change.
    """
    fn = decode_fn or _stub_decode

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [fn(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "features": [d[2] for d in decoded],
                }
            )

    return df.mapInPandas(batches, DECODE_SCHEMA)


def documents_with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the text re-encoded as an opaque binary column
    (test stand-in for an image/audio payload column)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )


# ---------------------------------------------------------------------------
# Resize stage (mapInPandas, 1→1)
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("src_width", IntegerType()),
        StructField("src_height", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("resized_fp", StringType()),
    ]
)


def _stub_resize(payload: bytes, target: tuple[int, int]) -> str:
    """Deterministic fake resampler: fingerprint of (payload,
    target) — stands in for the PIL ``Image.resize`` bytes. The
    plumbing (schema, batching, partitioning) is the real part."""
    return hashlib.md5(payload + f"|{target[0]}x{target[1]}".encode()).hexdigest()


def resize_payloads(
    df: DataFrame,
    target: tuple[int, int] = (32, 32),
    payload_col: str = "payload",
    id_col: str = "doc_id",
    resize_fn: Callable[[bytes, tuple[int, int]], str] | None = None,
) -> DataFrame:
    """Resize/resample stage: source dims (from the stub decoder) +
    target dims + resized-content fingerprint, one output row per
    input row via ``mapInPandas``.

    Same pluggable-callable contract as decode_payloads: swap
    ``resize_fn`` for a PIL/ffmpeg-backed one in deployment; an
    import-gated real implementation raises NotImplementedError
    inside the callable without touching the Spark plumbing.
    Map-only and partition-preserving — at 100 TB the stage scales
    with input splits and shuffles nothing.
    """
    fn = resize_fn or _stub_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [bytes(p) for p in pdf[payload_col]]
            decoded = [_stub_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "src_width": [d[0] for d in decoded],
                    "src_height": [d[1] for d in decoded],
                    "width": target[0],
                    "height": target[1],
                    "resized_fp": [fn(p, target) for p in payloads],
                }
            )

    return df.mapInPandas(batches, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Frame-sampling stage (mapInPandas, 1→N)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("total_frames", IntegerType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_fp", StringType()),
    ]
)

#: Frames sampled per payload (evenly spaced over the fake stream).
N_SAMPLED_FRAMES = 4


def sample_frames(
    df: DataFrame,
    n_frames: int = N_SAMPLED_FRAMES,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Video frame-sampling plumbing: each payload expands to up to
    ``n_frames`` evenly-spaced frame rows — the 1→N batch shape
    (output rows ≠ input rows) that distinguishes a frame sampler
    from a per-row UDF, and the reason this is ``mapInPandas`` and
    not ``withColumn``.

    The stub derives a fake frame count from the payload length and
    fingerprints each sampled frame deterministically; a real
    deployment decodes with pyav/ffmpeg inside the same batch
    function. Frame expansion happens inside the executor batch —
    nothing is exploded through a shuffle.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "doc_id": [],
                "total_frames": [],
                "frame_idx": [],
                "frame_fp": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                p = bytes(payload)
                total = 1 + len(p) % 240
                k = min(n_frames, total)
                idxs = sorted({(i * total) // k for i in range(k)})
                for idx in idxs:
                    out["doc_id"].append(int(doc_id))
                    out["total_frames"].append(total)
                    out["frame_idx"].append(idx)
                    out["frame_fp"].append(
                        hashlib.md5(p + f"|frame{idx}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Round 7: payload size histogram (storage planning for binary columns)
# ---------------------------------------------------------------------------

def multimodal_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-size distribution of the opaque binary payload per
    language, in fixed bands — the storage-planning report for
    multimodal columns (row-group sizing, inline-vs-external blob
    thresholds, shuffle-width estimates all start from "how big are
    the blobs"). Bands are powers of two around the corpus range so
    the report stays comparable across scale factors.

    Integer-exact: octet lengths, BIGINT sums, one DIV per share.

    Plan: map-only length + band classification, ONE
    |langs × bands| aggregate; shares ride SinglePartition on that
    tiny relation.
    """
    df = load_table(spark, sf_dir, "documents").select(
        "lang", F.encode("text", "utf-8").alias("payload")
    )
    band_expr = (
        "CASE WHEN n_bytes < 128 THEN 'a_lt_128' "
        "WHEN n_bytes < 256 THEN 'b_lt_256' "
        "WHEN n_bytes < 512 THEN 'c_lt_512' "
        "ELSE 'd_ge_512' END"
    )
    return (
        df.select("lang", F.octet_length("payload").alias("n_bytes"))
        .withColumn("band", F.expr(band_expr))
        .groupBy("lang", "band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_bytes").cast("bigint")).alias("bytes"),
            F.min("n_bytes").alias("min_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
        .withColumn(
            "lang_share_bp",
            F.expr(
                "(n_docs * 10000) DIV SUM(n_docs) OVER (PARTITION BY lang)"
            ),
        )
        .select(
            "lang", "band", "n_docs", "bytes", "min_bytes", "max_bytes",
            "lang_share_bp",
        )
        .orderBy("lang", "band")
    )


MULTIMODAL_SIZE_HISTOGRAM_SQL = """
WITH d AS (
  SELECT lang, octet_length(encode(text)) AS n_bytes FROM documents
), banded AS (
  SELECT lang,
         CASE WHEN n_bytes < 128 THEN 'a_lt_128'
              WHEN n_bytes < 256 THEN 'b_lt_256'
              WHEN n_bytes < 512 THEN 'c_lt_512'
              ELSE 'd_ge_512' END AS band,
         n_bytes
  FROM d
), agg AS (
  SELECT lang, band,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_bytes) AS BIGINT) AS bytes,
         MIN(n_bytes) AS min_bytes,
         MAX(n_bytes) AS max_bytes
  FROM banded GROUP BY lang, band
)
SELECT lang, band, n_docs, bytes, min_bytes, max_bytes,
       (n_docs * 10000)
         // CAST(SUM(n_docs) OVER (PARTITION BY lang) AS BIGINT)
         AS lang_share_bp
FROM agg
ORDER BY lang, band
"""
