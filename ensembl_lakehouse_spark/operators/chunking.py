"""Document chunking + sequence packing (EXT — the two operators
between raw curated text and a training batch).

The reference stops at SELECT-project-filter (app/main.py:479); an
LLM data pipeline continues: split each document into overlapping
token windows sized for the model's context ("chunking"), then lay
the chunks end-to-end and cut fixed-length training sequences
("packing", the GPT-style concat-then-chunk that wastes no tokens
on padding).

Scale design:

- **Chunking is map-only 1→N.** The token array is let-bound once
  per doc (the CollapseProject trick from functions/text.py), the
  window-starts array is arithmetic over ``sequence()``, and
  ``posexplode`` fans out inside the scan stage — no shuffle at any
  corpus size; output rows ≈ input tokens / stride.
- **Packing is one window pass per pack group.** The running token
  offset is a cumulative sum partitioned by ``lang`` (the pack
  group — real pipelines pack per source/language bucket exactly so
  the window parallelizes; a single global cumsum would serialize
  on one task). Sequence id = offset ÷ SEQ_LEN: chunks straddle
  sequence boundaries by construction, like GPT-style packing —
  boundary tokens are accounted to the sequence where they start.

Determinism: chunk order inside a pack group is (doc_id,
chunk_idx) — total, engine-independent; all arithmetic is integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ensembl_lakehouse_spark.sources.tables import load_spread, load_table

#: Tokens per chunk and stride between chunk starts (overlap = CHUNK_W - CHUNK_S).
CHUNK_W = 64
CHUNK_S = 48
#: Tokens per packed training sequence.
SEQ_LEN = 512


_TOKS = "split(trim(text), '\\\\s+')"


def _starts_expr(width: int, stride: int) -> str:
    """1-based start positions of every chunk window for a token
    array bound as ``t``: 1, 1+S, 1+2S, …, covering the tail (last
    window may be shorter than ``width``; every doc yields ≥1
    chunk)."""
    return (
        f"transform(sequence(0, cast(greatest(size(t) - {width} + {stride} - 1, 0) "
        f"div {stride} AS int)), i -> i * {stride} + 1)"
    )


def chunk_documents(
    spark: SparkSession,
    sf_dir: str,
    *,
    width: int = CHUNK_W,
    stride: int = CHUNK_S,
    spread: bool = True,
) -> DataFrame:
    """Split every document into ``width``-token windows every
    ``stride`` tokens (width−stride token overlap, the standard
    boundary-context trick; defaults oracle-pinned, per-request
    overrides via service/params.py — chunk geometry is THE knob a
    RAG/packing pipeline sweeps). Emits (doc_id, lang, chunk_idx,
    chunk_start, n_chunk_tokens, chunk_fp) — the fingerprint stands
    in for the chunk text so the contract result stays narrow; a
    pipeline keeps the text column too (same plan, wider rows).

    ``spread=False`` for consumers that reference this lattice more
    than once in one plan (each reference re-pays the spread
    exchange — the _docs_with_tokens rule)."""
    # conditional doc_id spread (guide §2.5): per-chunk md5 map work
    base = (
        load_spread(spark, sf_dir, "documents", "doc_id")
        if spread
        else load_table(spark, sf_dir, "documents")
    )
    docs = base.where(F.length(F.trim("text")) > 0)
    chunks = (
        f"transform(array({_TOKS}), t -> transform({_starts_expr(width, stride)}, "
        f"s -> named_struct("
        f"'chunk_start', s, "
        f"'n_chunk_tokens', size(slice(t, s, {width})), "
        f"'chunk_fp', md5(array_join(slice(t, s, {width}), ' ')))))[0]"
    )
    return (
        docs.select(
            "doc_id", "lang", F.posexplode(F.expr(chunks)).alias("chunk_idx", "c")
        )
        .select(
            "doc_id",
            "lang",
            "chunk_idx",
            F.col("c.chunk_start").alias("chunk_start"),
            F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
            F.col("c.chunk_fp").alias("chunk_fp"),
        )
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
), starts AS (
  SELECT doc_id, lang, toks,
         unnest(list_transform(
           range(0, CAST(greatest(len(toks) - {CHUNK_W} + {CHUNK_S} - 1, 0)
                 // {CHUNK_S} AS INTEGER) + 1),
           i -> {{'chunk_idx': i, 'chunk_start': i * {CHUNK_S} + 1}}),
           recursive := true)
  FROM t
)
SELECT doc_id, lang, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk_start,
       len(list_slice(toks, chunk_start, chunk_start + {CHUNK_W} - 1)) AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, chunk_start, chunk_start + {CHUNK_W} - 1), ' ')) AS chunk_fp
FROM starts
"""


def pack_sequences(
    spark: SparkSession, sf_dir: str, *, seq_len: int = SEQ_LEN
) -> DataFrame:
    """Lay chunks end-to-end per pack group (lang) and cut
    ``seq_len``-token training sequences (default SEQ_LEN,
    oracle-pinned; service/params.py carries per-request overrides —
    context length is the other half of the chunk-geometry sweep): per sequence, how many chunks/docs
    feed it and how full it is. The concat-then-chunk accounting —
    zero padding waste; a chunk straddling the boundary counts
    toward the sequence where it starts.

    Plan: chunking is map-only; ONE shuffle partitions by lang for
    the running-offset window; the per-sequence aggregation reuses
    that partitioning (seq id is a function of lang + offset), so
    packing costs exactly one data movement.
    """
    chunks = chunk_documents(spark, sf_dir)
    w = (
        "(PARTITION BY lang ORDER BY doc_id, chunk_idx "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    placed = chunks.select(
        "lang",
        "doc_id",
        "n_chunk_tokens",
        (
            F.expr(f"sum(n_chunk_tokens) OVER {w}") - F.col("n_chunk_tokens")
        ).alias("token_offset"),
    ).withColumn("seq_id", F.expr(f"token_offset div {seq_len}"))
    return (
        placed.groupBy("lang", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_chunk_tokens").alias("n_tokens_started"),
        )
        .orderBy("lang", "seq_id")
    )


PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents WHERE length(trim(text)) > 0
), starts AS (
  SELECT doc_id, lang, toks,
         unnest(list_transform(
           range(0, CAST(greatest(len(toks) - {CHUNK_W} + {CHUNK_S} - 1, 0)
                 // {CHUNK_S} AS INTEGER) + 1),
           i -> {{'chunk_idx': i, 'chunk_start': i * {CHUNK_S} + 1}}),
           recursive := true)
  FROM t
), chunks AS (
  SELECT doc_id, lang, CAST(chunk_idx AS INTEGER) AS chunk_idx,
         len(list_slice(toks, chunk_start, chunk_start + {CHUNK_W} - 1)) AS n_chunk_tokens
  FROM starts
), placed AS (
  SELECT lang, doc_id, n_chunk_tokens,
         SUM(n_chunk_tokens) OVER (PARTITION BY lang ORDER BY doc_id, chunk_idx
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chunk_tokens
           AS token_offset
  FROM chunks
)
SELECT lang, CAST(token_offset // {SEQ_LEN} AS BIGINT) AS seq_id,
       COUNT(*) AS n_chunks,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(n_chunk_tokens) AS BIGINT) AS n_tokens_started
FROM placed
GROUP BY lang, token_offset // {SEQ_LEN}
ORDER BY lang, seq_id
"""


#: Sample doc ids carried per repeated chunk (bounded array row).
BOILERPLATE_SAMPLE = 8


def chunk_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detector: chunk fingerprints that repeat across
    DISTINCT documents — the header/footer/navigation text a
    chunk-level pipeline strips before training (page-level dedup
    misses it because the surrounding document differs; the repeated
    WINDOW is the unit that matters). Emits per repeated fingerprint:
    distinct docs, total occurrences, chunk width, and a sorted
    capped sample of carrier doc_ids (comma-joined to a scalar
    string so every output column is driver-hashable).

    Plan: rides chunk_documents' map-only lattice; ONE partial agg
    per fingerprint. The sample array is bounded (slice of
    sort_array) exactly like inverted_postings' posting cap, so a
    fingerprint appearing in millions of docs still yields one
    narrow row at 100 TB.
    """
    # spread reverted (r11 A/B): +0.30 s at sf0.1 — the per-fp agg
    # clusters on chunk_fp, not doc_id, so the spread exchange is
    # never absorbed downstream
    chunks = chunk_documents(spark, sf_dir, spread=False)
    return (
        chunks.groupBy("chunk_fp")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("n_chunk_tokens").alias("n_chunk_tokens"),
            F.array_join(
                F.slice(
                    F.sort_array(F.collect_set("doc_id")), 1, BOILERPLATE_SAMPLE
                ),
                ",",
            ).alias("sample_doc_ids"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "chunk_fp")
    )


CHUNK_BOILERPLATE_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, text FROM documents WHERE length(trim(text)) > 0
), toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk FROM t
), starts AS (
  SELECT doc_id, tk,
         unnest(range(0, CAST(greatest(len(tk) - {CHUNK_W} + {CHUNK_S} - 1, 0)
                              // {CHUNK_S} AS BIGINT) + 1)) AS i
  FROM toks
), chunks AS (
  SELECT doc_id,
         len(list_slice(tk, i * {CHUNK_S} + 1, i * {CHUNK_S} + {CHUNK_W})) AS n_chunk_tokens,
         md5(list_aggregate(list_slice(tk, i * {CHUNK_S} + 1, i * {CHUNK_S} + {CHUNK_W}),
             'string_agg', ' ')) AS chunk_fp
  FROM starts
)
SELECT chunk_fp,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_occurrences,
       CAST(MAX(n_chunk_tokens) AS BIGINT) AS n_chunk_tokens,
       array_to_string(
         list_slice(list_sort(list_distinct(list(doc_id))), 1, {BOILERPLATE_SAMPLE}),
         ',') AS sample_doc_ids
FROM chunks
GROUP BY chunk_fp
HAVING COUNT(DISTINCT doc_id) > 1
ORDER BY n_docs DESC, n_occurrences DESC, chunk_fp
"""
