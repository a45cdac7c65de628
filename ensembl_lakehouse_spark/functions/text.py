"""Tokenization / shingling expression builders (JVM-side only).

Each helper documents its DuckDB SQL twin so operators can keep the
Spark plan and the oracle SQL in lock-step. Whitespace tokenization
follows the common LLM-pipeline convention (split on ``\\s+`` after
trim); the "BPE-ish" tokenizer is the byte-pair-style pre-tokenize
regex (letter runs | digit runs | single non-space symbol) used as a
cheap token-count proxy when a real BPE vocab is not available.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: Pre-tokenizer regex: letter runs, digit runs, or one symbol.
BPE_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

#: Canonical text normalization, as Spark SQL / DuckDB SQL text.
#: Single source of truth — operators interpolate THESE strings so
#: the plan and its oracle can't drift (advice r1).
NORM_SPARK_SQL = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
NORM_DUCK_SQL = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"


def normalize_text(col: Column | str) -> Column:
    """lower + trim + collapse internal whitespace to single spaces.

    DuckDB twin: ``lower(trim(regexp_replace(x, '\\s+', ' ', 'g')))``
    (DuckDB needs the explicit global flag; Spark replaces all
    occurrences by default).
    """
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def whitespace_tokens(col: Column | str) -> Column:
    """``array<string>`` of whitespace-delimited tokens.

    DuckDB twin: ``string_split_regex(trim(x), '\\s+')``.
    """
    return F.split(F.trim(col), r"\s+")


def bpe_tokens(col: str) -> Column:
    """BPE-style pre-tokens of the lowercased text. ``col`` is a SQL
    expression string (same convention as the other lambda helpers).

    DuckDB twin: ``regexp_extract_all(lower(x), '{BPE_REGEX}')``.
    """
    return F.expr(
        f"regexp_extract_all(lower({_sql(col)}), '{BPE_REGEX}', 0)"
    )


def word_shingles(tokens_sql: str, n: int) -> Column:
    """Distinct word n-grams (space-joined) from a token array.

    ``tokens_sql`` is a SQL expression producing ``array<string>``.
    Documents shorter than ``n`` tokens yield a single shingle of all
    their tokens (so every doc has ≥1 shingle and Jaccard is defined).

    DuckDB twin (1-based, same guard)::

        list_distinct(list_transform(
          range(1, greatest(len(toks) - {n} + 1, 1) + 1),
          i -> array_to_string(list_slice(toks, i, i + {n} - 1), ' ')))

    Scale: shingling is a per-row ``transform`` — no shuffle, no
    Python; O(tokens) per document inside codegen.
    """
    return F.expr(
        f"array_distinct(transform("
        f"sequence(1, greatest(size({tokens_sql}) - {n} + 1, 1)), "
        f"i -> array_join(slice({tokens_sql}, i, {n}), ' ')))"
    )


def sql_word_shingles(toks: str, n: int) -> str:
    """DuckDB twin of :func:`word_shingles`."""
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n} + 1, 1) + 1), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n} - 1), ' ')))"
    )


def _sql(col: Column | str) -> str:
    if isinstance(col, str):
        return col
    raise TypeError("pass a SQL expression string for lambda helpers")
