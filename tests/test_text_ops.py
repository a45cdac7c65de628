"""Unit tests: functions/hashing + operators/text.

The oracle differential (tools/check_oracle.py, driver t2) is the
deep correctness gate; these tests pin the cross-engine hash
contract to known values and check operator invariants fast.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_lakehouse_spark.functions.hashing import md5_long31, md5_long60, rolling_hash
from ensembl_lakehouse_spark.operators import text as T
from tests.conftest import SF_DIR

# Values verified against DuckDB 1.0:
#   CAST('0x'||substr(md5(s),1,15) AS BIGINT) etc.
KNOWN = {
    "hello world": (426544247714475757, 1589001147, 204910434),
    "köln": (333651908426596093, 1242950217, 3427501),
    "": (955282973525019424, 1411222746, 0),
}


def test_hash_contract_pinned(spark):
    df = spark.createDataFrame([(s,) for s in KNOWN], ["t"])
    rows = df.select(
        "t",
        md5_long60("t").alias("h60"),
        md5_long31("t").alias("h31"),
        rolling_hash("t").alias("rh"),
    ).collect()
    for row in rows:
        h60, h31, rh = KNOWN[row.t]
        assert (row.h60, row.h31, row.rh) == (h60, h31, rh), row.t


def test_token_stats_invariants(spark):
    rows = T.text_token_stats(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_tokens >= 1
        assert 1 <= r.n_distinct_tokens <= r.n_tokens
        assert r.n_bpe_tokens >= r.n_tokens  # BPE splits at least as fine
        assert 0 < r.avg_token_len <= r.n_chars_len


def test_langid_predicts_known_language(spark):
    rows = T.text_langid(spark, SF_DIR).collect()
    assert rows
    langs = set(T.LANG_MARKERS)
    for r in rows:
        assert r.predicted_lang in langs
        assert r.is_match == (r.predicted_lang == r.lang)


def test_quality_score_bounds_and_verdict(spark):
    rows = T.text_quality(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.stop_ratio <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.quality_score <= 1.0
        assert r.verdict == ("keep" if r.quality_score >= 0.5 else "drop")


def test_fingerprint_deterministic_and_distinct(spark):
    a = {r.doc_id: (r.fp_md5, r.fp_roll, r.fp_winnow) for r in T.text_fingerprint(spark, SF_DIR).collect()}
    b = {r.doc_id: (r.fp_md5, r.fp_roll, r.fp_winnow) for r in T.text_fingerprint(spark, SF_DIR).collect()}
    assert a == b
    assert all(v[0] >= 0 and v[1] >= 0 and v[2] >= 0 for v in a.values())
    # md5 fingerprints of distinct texts should be (near-)unique
    assert len({v[0] for v in a.values()}) > len(a) * 0.9


def test_fingerprint_detects_exact_dup_after_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "different doc")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.fp_md5
        for r in df.select(
            "doc_id",
            F.expr(
                "cast(conv(substring(md5(lower(trim(regexp_replace(text, '\\\\s+', ' ')))), 1, 15), 16, 10) AS long)"
            ).alias("fp_md5"),
        ).collect()
    }
    assert out[1] == out[2] != out[3]


def test_redact_df_on_crafted_pii(spark):
    """The fixture corpus has no PII, so the oracle only proves the
    no-op path; this drives the cascade with real-shaped PII."""
    from ensembl_lakehouse_spark.operators.text import redact_df

    rows = [
        (1, "mail me at jane.doe+spam@corp.example.com today"),
        (2, "see https://example.com/a?b=c#frag and also http://x.io"),
        (3, "call +1 (555) 123-4567 or 555 867 5309 ok"),
        (4, "ssn 123-45-6789 leaked"),
        (5, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in redact_df(df, "text", ["doc_id"]).collect()}

    assert out[1].n_email == 1 and "<EMAIL>" in out[1].redacted
    assert "jane" not in out[1].redacted
    assert out[2].n_url == 2 and out[2].redacted.count("<URL>") == 2
    assert out[3].n_phone == 2 and out[3].redacted.count("<PHONE>") == 2
    assert out[4].n_ssn == 1 and "<SSN>" in out[4].redacted
    assert not out[5].was_redacted and out[5].redacted == rows[4][1]
    assert all(out[i].was_redacted for i in (1, 2, 3, 4))


def test_repetition_invariants(spark):
    """Every doc with >=2 tokens has exactly n_tokens-1 bigrams;
    all three fractions are well-defined probabilities; a corpus of
    ~200 synthetic words must show heavy bigram repetition."""
    rows = T.text_repetition(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_bigrams == r.n_tokens - 1, r.doc_id
        assert 0.0 <= r.dup_token_frac < 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac < 1.0
        # top bigram accounts for at least its share of duplicates
        assert r.top_bigram_frac >= (1.0 / r.n_bigrams)


def test_decontaminate_excludes_benchmark_and_bounds(spark):
    from ensembl_lakehouse_spark.operators.pipeline import BENCH_MOD, decontaminate

    rows = decontaminate(spark, SF_DIR).collect()
    assert rows, "fixture corpus should have some contaminated docs"
    for r in rows:
        assert r.doc_id % BENCH_MOD != 0, "benchmark docs must not be flagged"
        assert 1 <= r.n_contaminated <= r.n_shingles
        assert 0.0 < r.contamination_frac <= 1.0


def test_bpe_pair_counts_match_python(spark):
    """Pin the distributed pair counts against a direct Python BPE
    first-iteration recount (per-occurrence, unweighted), proving
    the word-frequency-weighted formulation is count-equivalent."""
    import re
    from collections import Counter

    from ensembl_lakehouse_spark.functions.text import BPE_REGEX

    rows = T.bpe_pair_counts(spark, SF_DIR).collect()
    texts = [
        r.text
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
        if r.text and r.text.strip()
    ]
    counts: Counter = Counter()
    for t in texts:
        for w in re.findall(BPE_REGEX, t.lower()):
            if len(w) >= 2:
                for i in range(len(w) - 1):
                    counts[f"{w[i]} {w[i + 1]}"] += 1
    expected = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: T.TOP_PAIRS]
    got = sorted(rows, key=lambda r: r.rank)
    assert [(r.pair, r.n) for r in got] == expected
    assert [r.rank for r in got] == list(range(1, T.TOP_PAIRS + 1))


def test_curation_funnel_matches_pipeline(spark):
    """The funnel is an audit OF pipeline_curation: its final stage
    count must equal the pipeline's surviving row count, and the
    stage counts must be monotone non-increasing."""
    from ensembl_lakehouse_spark.operators import pipeline as P

    row = P.curation_funnel(spark, SF_DIR).collect()[0]
    assert (
        row.n_raw >= row.n_nonblank >= row.n_quality
        >= row.n_unique >= row.n_quota >= row.n_sampled
    )
    assert row.n_sampled == P.pipeline_curation(spark, SF_DIR).count()
    assert row.n_sampled > 0


def test_langid_confusion_totals(spark):
    """Cells partition the corpus: Σn_cell == doc count; per-label
    totals equal the window column; diagonal = is_match count."""
    from ensembl_lakehouse_spark.operators import text as T

    rows = T.langid_confusion(spark, SF_DIR).collect()
    docs = T.text_langid(spark, SF_DIR).collect()
    assert sum(r.n_cell for r in rows) == len(docs)
    from collections import Counter

    label_tot = Counter(d.lang for d in docs)
    for r in rows:
        assert r.n_label == label_tot[r.lang]
    diag = sum(r.n_cell for r in rows if r.lang == r.predicted_lang)
    assert diag == sum(1 for d in docs if d.is_match)


def test_chunk_boilerplate_flags_cross_doc_repeats(spark):
    """Every flagged fingerprint genuinely appears in >1 distinct doc
    (recomputed from chunk_documents); sample ids are carriers."""
    from collections import defaultdict

    from ensembl_lakehouse_spark.operators import chunking as C

    chunks = C.chunk_documents(spark, SF_DIR).collect()
    carriers = defaultdict(set)
    for c in chunks:
        carriers[c.chunk_fp].add(c.doc_id)
    rows = C.chunk_boilerplate(spark, SF_DIR).collect()
    flagged = {r.chunk_fp for r in rows}
    assert flagged == {fp for fp, d in carriers.items() if len(d) > 1}
    for r in rows:
        assert r.n_docs == len(carriers[r.chunk_fp])
        # comma-joined scalar string (driver-hashable, r4 red-row fix)
        sample = [int(x) for x in r.sample_doc_ids.split(",")]
        assert set(sample) <= carriers[r.chunk_fp]
        assert len(sample) <= C.BOILERPLATE_SAMPLE
