"""BPE tokenizer application (EXT X3): train a merge table, then
ENCODE the corpus with it — the apply side of the tokenizer story
whose train-side statistic is text.bpe_pair_counts (the reference
computes nothing itself, app/main.py:477-479; a training-data
pipeline tokenizes every document at least once per tokenizer
version, so encode throughput is a first-class workload).

Shape:

- **Training** runs the classic Sennrich BPE loop over the (word,
  count) vocabulary. Here the vocabulary is collected and the loop
  runs driver-side — bounded because BPE training state is the
  DISTINCT-word vocab with counts, not the token stream (the same
  reduction bpe_pair_counts exploits; HuggingFace tokenizers trains
  from exactly this word-count table). At web scale the pair
  recount inside the loop is the distributed bpe_pair_counts plan
  re-issued per merge; the merge table that comes out is identical.
- **Encoding is map-only**: the merge-rank table broadcasts to every
  executor (closure capture — it is O(n_merges)), and each Arrow
  batch of documents encodes independently in a mapInPandas stage
  (the sanctioned Python seam: per-word greedy lowest-rank merging
  is genuinely iterative per token, which no Catalyst expression
  expresses). Zero shuffle; linear to 100 TB.

No SQL oracle: greedy merge application is loop-until-fixed-point
per word (dedup_components / embedding_pca precedent — the driver
records the rows-only check). The pytest pin re-encodes collected
documents with the same pure-Python reference and also checks the
trained table's first merge against bpe_pair_counts' rank-1 pair.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ensembl_lakehouse_spark.functions.text import BPE_REGEX
from ensembl_lakehouse_spark.sources.tables import load_spread, load_table

#: Merges trained for the demo table.
N_MERGES = 20

#: Default cap on the distinct-pretoken vocabulary collected to the
#: driver for BPE training. Real tokenizer trainers never ingest the
#: raw distinct-word table either — HuggingFace applies
#: ``min_frequency`` and SentencePiece prunes to ``vocab_size``
#: before the in-memory loop. 500k (count, word) rows is a few tens
#: of MB; fixture corpora have ~10^3 distinct pretokens so the cap
#: is a provable no-op there (pinned in tests/test_tokenize.py). At
#: 100 TB of web text, distinct pretokens run to 10^8-10^9 and an
#: uncapped collect kills the driver; production additionally sets
#: min_count >= 2 to drop the typo/unicode-junk long tail before
#: the top-N even applies.
TOP_N_VOCAB = 500_000

_ENCODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("n_pretokens", LongType(), False),
        StructField("n_chars_tok", LongType(), False),
        StructField("n_bpe_tokens", LongType(), False),
        StructField("chars_per_token", DoubleType(), False),
    ]
)


def train_bpe_merges(
    spark: SparkSession,
    sf_dir: str,
    n_merges: int = N_MERGES,
    min_count: int = 1,
    top_n: int = TOP_N_VOCAB,
) -> list[tuple[str, str]]:
    """Classic BPE training over the corpus word-count vocabulary;
    returns the ordered merge list.

    The driver collect is bounded BEFORE it happens: pretokens with
    fewer than ``min_count`` occurrences are filtered executor-side,
    and at most ``top_n`` survivors are shipped, chosen
    deterministically by (count desc, word asc) — Spark plans the
    sort+limit as TakeOrderedAndProject, a per-partition top-N heap
    with no full sort. Defaults (min_count=1, top_n=500k) are
    no-ops on any fixture corpus, so trained merges are unchanged
    there (pinned in tests/test_tokenize.py); production web-scale
    runs set min_count>=2, which is what HuggingFace
    ``min_frequency`` / SentencePiece vocab pruning do."""
    docs = load_spread(spark, sf_dir, "documents", "doc_id").where(
        F.length(F.trim("text")) > 0
    )
    wc = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(lower(text), '{BPE_REGEX}', 0)")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if min_count > 1:
        wc = wc.where(F.col("n") >= min_count)
    wc_rows = (
        wc.orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(top_n)  # bounded collect: deterministic top-N vocab
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r.w): r.n for r in wc_rows if len(r.w) >= 2
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + n
        if not counts:
            break
        # argmax with the bpe_pair_counts tie-break: count desc, pair asc
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged: dict[tuple[str, ...], int] = {}
        for symbols, n in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and (symbols[i], symbols[i + 1]) == best
                ):
                    out.append(symbols[i] + symbols[i + 1])
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + n
        vocab = merged
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE encode: repeatedly merge the lowest-rank adjacent
    pair (leftmost on rank ties) until none applies — the standard
    GPT-2-style apply loop."""
    symbols = list(word)
    while len(symbols) >= 2:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize every document with the trained merge table:
    (doc_id, n_pretokens, n_chars_tok, n_bpe_tokens, chars_per_token)
    — the compression audit a tokenizer rollout reports (chars per
    token is THE capacity metric training-budget planning uses).

    Train once driver-side, encode map-only via mapInPandas (see
    module docstring for the scale argument of each half)."""
    merges = train_bpe_merges(spark, sf_dir)
    ranks = {pair: i for i, pair in enumerate(merges)}
    import re as _re

    pattern = _re.compile(BPE_REGEX)

    def encode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Per-task memo (guide §4.5): pretoken -> encoded length.
        # Greedy BPE is deterministic per word, and word frequency is
        # Zipfian, so the distinct-pretoken vocabulary is orders of
        # magnitude smaller than the token stream — each task encodes
        # each distinct word ONCE and sums counts (measured 1.69 s →
        # 0.58 s at sf0.1; identical results, pinned by the pytest
        # pure-Python re-encode).
        enc_len: dict[str, int] = {}
        for pdf in batches:
            rows = []
            for doc_id, txt in zip(pdf["doc_id"], pdf["text"]):
                words = pattern.findall(str(txt).lower())
                n_tok = 0
                for w in words:
                    n = enc_len.get(w)
                    if n is None:
                        n = len(encode_word(w, ranks))
                        enc_len[w] = n
                    n_tok += n
                n_chars = sum(len(w) for w in words)
                rows.append(
                    (
                        int(doc_id),
                        len(words),
                        n_chars,
                        n_tok,
                        (n_chars / n_tok) if n_tok else 0.0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_pretokens",
                    "n_chars_tok",
                    "n_bpe_tokens",
                    "chars_per_token",
                ],
            )

    docs = (
        # NOT spread: encode_batches builds the trained encoder once
        # per task (guide §4.5); fanning the tiny fixture corpus to
        # 32 tasks multiplies that init cost past the map win
        # (measured 1.5 s -> 2.3 s pre-memo, 0.58 s -> 0.88 s with
        # the memo). At scale the scan is already parallel and the
        # per-task init amortizes over full splits.
        load_table(spark, sf_dir, "documents")
        .where(F.length(F.trim("text")) > 0)
        .select("doc_id", "text")
    )
    return docs.mapInPandas(encode_batches, schema=_ENCODE_SCHEMA).orderBy(
        "doc_id"
    )
