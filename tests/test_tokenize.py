"""BPE tokenizer: trained merge table consistent with the
distributed pair-count primitive; distributed encode pinned against
a driver-side recompute with the same reference encoder."""

from __future__ import annotations

import re

from ensembl_lakehouse_spark.functions.text import BPE_REGEX
from ensembl_lakehouse_spark.operators import text as T
from ensembl_lakehouse_spark.operators import tokenize as TK
from ensembl_lakehouse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_first_merge_matches_pair_counts_rank1(spark):
    merges = TK.train_bpe_merges(spark, SF_DIR)
    assert 1 <= len(merges) <= TK.N_MERGES
    rank1 = next(
        r.pair for r in T.bpe_pair_counts(spark, SF_DIR).collect() if r.rank == 1
    )
    assert " ".join(merges[0]) == rank1


def test_distributed_encode_matches_reference(spark):
    merges = TK.train_bpe_merges(spark, SF_DIR)
    ranks = {pair: i for i, pair in enumerate(merges)}
    pattern = re.compile(BPE_REGEX)

    got = {
        r.doc_id: (r.n_pretokens, r.n_chars_tok, r.n_bpe_tokens)
        for r in TK.bpe_encode(spark, SF_DIR).collect()
    }
    docs = (
        load_table(spark, SF_DIR, "documents")
        .where("length(trim(text)) > 0")
        .select("doc_id", "text")
        .collect()
    )
    assert len(got) == len(docs)
    for row in docs:
        words = pattern.findall(row.text.lower())
        n_tok = sum(len(TK.encode_word(w, ranks)) for w in words)
        n_chars = sum(len(w) for w in words)
        assert got[row.doc_id] == (len(words), n_chars, n_tok), row.doc_id
        # merging never expands and every word stays >= 1 token
        assert len(words) <= n_tok <= n_chars


def test_encode_word_greedy_properties():
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "d"): 2}
    assert TK.encode_word("abcd", ranks) == ["abc", "d"]  # rank order wins
    assert TK.encode_word("xyz", ranks) == ["x", "y", "z"]  # no merges apply
    assert "".join(TK.encode_word("abcabc", ranks)) == "abcabc"  # lossless


def test_vocab_cap_is_noop_on_fixture(spark):
    """The bounded-collect defaults must not change training on any
    corpus where the cap doesn't bind: capped (default) and
    effectively-uncapped runs produce identical merge tables, and a
    min_count high enough to prune the tail still trains (on the
    fixture every surviving pair ranks the same way)."""
    capped = TK.train_bpe_merges(spark, SF_DIR)
    # top-N far above the fixture vocab (but small enough that the
    # TakeOrdered priority queue stays allocation-friendly)
    uncapped = TK.train_bpe_merges(spark, SF_DIR, min_count=1, top_n=1_000_000)
    assert capped == uncapped
    # a binding top_n changes the vocab yet stays deterministic
    small_a = TK.train_bpe_merges(spark, SF_DIR, top_n=50)
    small_b = TK.train_bpe_merges(spark, SF_DIR, top_n=50)
    assert small_a == small_b
