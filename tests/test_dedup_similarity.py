"""Property tests for the X1 dedup and X2 similarity operators.

The driver's oracle already hash-checks these plans against DuckDB;
these tests assert the *semantic* properties the hash can't express:
LSH recall vs the exact baseline, pair symmetry/threshold invariants,
and exact-dedup partition algebra.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ensembl_lakehouse_spark.operators import dedup as D
from ensembl_lakehouse_spark.operators import similarity as S
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def near_pairs(spark):
    return D.dedup_near(spark, SF_DIR).collect()


def test_dedup_exact_partitions_corpus(spark):
    rows = D.dedup_exact(spark, SF_DIR).collect()
    # Every doc appears exactly once, and each fingerprint group has
    # exactly one canonical representative (its min doc_id).
    assert len({r.doc_id for r in rows}) == len(rows)
    by_fp: dict[int, list] = {}
    for r in rows:
        by_fp.setdefault(r.fp_md5, []).append(r)
    for grp in by_fp.values():
        assert sum(r.is_canonical for r in grp) == 1
        assert min(g.doc_id for g in grp) == next(g.doc_id for g in grp if g.is_canonical)
        assert all(g.n_copies == len(grp) for g in grp)


def test_dedup_near_pairs_are_valid(near_pairs):
    for r in near_pairs:
        assert r.doc_a < r.doc_b
        assert r.jaccard >= D.JACCARD_THRESHOLD
        assert r.n_common <= min(r.n_sh_a, r.n_sh_b)
    # No duplicate pairs out of the banded join.
    assert len({(r.doc_a, r.doc_b) for r in near_pairs}) == len(near_pairs)


def test_dedup_near_catches_all_pairs_above_threshold(spark, near_pairs):
    """LSH recall check: compare against all-pairs exact Jaccard
    (feasible at test SF). With B=4/R=4 bands, pairs at j>=0.8 share
    a band with p>=0.97 each; the fixture's planted pairs are at
    j>=0.9 where p>0.9996 — expect full recall."""
    s = D._shingled(spark, SF_DIR)
    a = s.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = s.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    allp = (
        a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .withColumn("ni", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "j",
            F.col("ni").cast("double") / (F.size("sh_a") + F.size("sh_b") - F.col("ni")),
        )
        .where(F.col("j") >= D.JACCARD_THRESHOLD)
        .select("doc_a", "doc_b")
        .collect()
    )
    truth = {(r.doc_a, r.doc_b) for r in allp}
    found = {(r.doc_a, r.doc_b) for r in near_pairs}
    assert found <= truth  # LSH + exact verify never invents a pair
    assert found == truth  # and at these j values recall is total


def test_similarity_topk_shape_and_order(spark):
    rows = S.similarity_topk(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert set(by_q) == set(range(S.N_QUERIES))
    for grp in by_q.values():
        grp.sort(key=lambda r: r.rank)
        assert [r.rank for r in grp] == list(range(1, S.TOP_K + 1))
        cosines = [r.cosine for r in grp]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.vec_id >= S.N_QUERIES for r in grp)  # no self-match


def test_similarity_lsh_recall(spark):
    exact = S.similarity_topk(spark, SF_DIR).collect()
    approx = S.similarity_lsh(spark, SF_DIR).collect()
    truth = {(r.q_id, r.vec_id) for r in exact}
    found = {(r.q_id, r.vec_id) for r in approx}
    # Candidates are a subset of the corpus scored exactly, so every
    # (q, v) the LSH returns at rank<=k with cosine >= exact kth
    # must be in the exact top-k; recall just needs to clear a floor.
    recall = len(found & truth) / len(truth)
    assert recall >= 0.5, f"LSH recall collapsed: {recall:.2f}"


def test_dedup_simhash_pairs_verified_and_guaranteed(spark):
    """Every returned pair is within the hamming threshold, and —
    the pigeonhole guarantee — EVERY pair of signatures within
    hamming ≤ SIMHASH_MAX_HAMMING (in an uncapped bucket) appears:
    4 bands of 15 bits cannot all differ on ≤3 flipped bits."""
    pairs = D.dedup_simhash(spark, SF_DIR).collect()
    assert all(0 <= r.hamming <= D.SIMHASH_MAX_HAMMING for r in pairs)
    assert all(r.doc_a < r.doc_b for r in pairs)

    toks = "split(trim(lower(text)), '\\\\s+')"
    sigs = (
        D.load_table(spark, SF_DIR, "documents")
        .where(F.length(F.trim("text")) > 0)
        .select("doc_id", F.expr(D._spark_simhash(toks)).alias("sim"))
    )
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sim").alias("sa"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sim").alias("sb"))
    truth = {
        (r.doc_a, r.doc_b)
        for r in a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.expr(f"bit_count(sa ^ sb) <= {D.SIMHASH_MAX_HAMMING}"))
        .collect()
    }
    assert {(r.doc_a, r.doc_b) for r in pairs} == truth


def test_dedup_components_match_union_find(spark, near_pairs):
    """The Spark label-propagation components must equal a Python
    union-find over the identical edge list — this pytest pin
    replaces the DuckDB oracle the iterative operator can't have."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for r in near_pairs:
        union(r.doc_a, r.doc_b)

    rows = D.dedup_components(spark, SF_DIR).collect()
    docs = {r.doc_id for r in rows}
    assert len(rows) == len(docs)  # every doc exactly once
    for r in rows:
        expected = find(r.doc_id) if r.doc_id in parent else r.doc_id
        assert r.component == expected, (r.doc_id, r.component, expected)
    # cluster_size is consistent with the component partition
    from collections import Counter

    sizes = Counter(r.component for r in rows)
    assert all(r.cluster_size == sizes[r.component] for r in rows)


def test_dedup_embedding_pairs_verified(spark):
    from ensembl_lakehouse_spark.operators import similarity as S2

    pairs = S2.dedup_embedding(spark, SF_DIR).collect()
    for r in pairs:
        assert r.vec_a < r.vec_b
        assert r.cosine >= S2.EMBED_DUP_THRESHOLD


def test_similarity_ivf_recall_and_pruning(spark):
    exact = {(r.q_id, r.vec_id) for r in S.similarity_topk(spark, SF_DIR).collect()}
    ivf = {(r.q_id, r.vec_id) for r in S.similarity_ivf(spark, SF_DIR).collect()}
    recall = len(exact & ivf) / len(exact)
    # Isotropic fixture: nprobe=4 of ~13 cells scans ~30% of the
    # corpus; neighbors are weakly clustered so recall floors low —
    # see the similarity module docstring for the envelope.
    assert recall >= 0.25, f"IVF recall collapsed: {recall:.2f}"


def test_topk_plan_is_two_phase(spark):
    """Plan-shape regression guard: the declarative rank<=k window
    must compile to a partial (map-side) WindowGroupLimit BEFORE the
    exchange — the property that keeps the shuffle O(k·tasks·q)
    instead of O(corpus) at 100 TB. If a Spark upgrade or a plan
    change loses the rewrite, this fails."""
    plan = S.similarity_topk(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    partial_idx = next(
        i for i, l in enumerate(lines) if "WindowGroupLimit" in l and "Partial" in l
    )
    exchange_idx = next(
        i for i, l in enumerate(lines) if "Exchange hashpartitioning(q_id" in l
    )
    # Plans print top-down: the Partial limit must sit BELOW the
    # exchange (executed before it).
    assert partial_idx > exchange_idx, plan


def test_components_recursive_matches_iterative(spark):
    """The recursive-CTE closure and the iterative Hash-Min loop
    must assign identical components to every paired document — the
    declarative form (which HAS a DuckDB oracle) transitively
    anchors the iterative one (which cannot be a single query)."""
    recursive = {
        r.doc_id: r.component for r in D.components_recursive(spark, SF_DIR).collect()
    }
    iterative = {
        r.doc_id: r.component for r in D.dedup_components(spark, SF_DIR).collect()
    }
    assert recursive  # non-vacuous: the fixture has near-dup pairs
    for doc_id, comp in recursive.items():
        assert iterative[doc_id] == comp, doc_id
    # every doc the recursive form does NOT cover is a singleton
    for doc_id, comp in iterative.items():
        if doc_id not in recursive:
            assert comp == doc_id, doc_id


def test_components_hop_cap_has_convergence_slack(spark):
    """COMPONENTS_MAX_HOPS guards a silent-failure mode: the DuckDB
    oracle embeds the same cap, so an under-capped recursion would
    make both engines agree on WRONG labels. Requiring labels at the
    cap to equal labels one hop below proves convergence happened
    with slack — a fixture regen that raises the pair-graph diameter
    breaks this loudly at round start."""
    at_cap = {
        r.doc_id: r.component
        for r in D.components_recursive(spark, SF_DIR).collect()
    }
    one_below = {
        r.doc_id: r.component
        for r in D.components_recursive(
            spark, SF_DIR, hops=D.COMPONENTS_MAX_HOPS - 1
        ).collect()
    }
    assert at_cap == one_below, (
        "labels still changing at the hop cap - raise COMPONENTS_MAX_HOPS"
    )


def test_dedup_substring_pairs_share_real_substrings(spark):
    """Every reported pair must truly share a >= SUBSTR_GRAM-char
    normalized substring (the join key is the gram text, so this is
    exactness, not recall), and the winnowing guarantee must hold:
    pairs sharing a run of >= GRAM+WINDOW-1 chars are reported
    unless every shared gram was capped as boilerplate."""
    pairs = D.dedup_substring(spark, SF_DIR).collect()
    assert pairs, "fixture should contain substring-sharing docs"
    docs = {
        r.doc_id: r.nrm
        for r in spark.sql(
            f"SELECT doc_id, {D.NORM_SPARK_SQL} AS nrm FROM "
            f"parquet.`{SF_DIR}/documents.parquet`"
        ).collect()
    }
    g = D.SUBSTR_GRAM
    for r in pairs[:200]:
        a, b = docs[r.doc_a], docs[r.doc_b]
        grams_a = {a[i : i + g] for i in range(len(a) - g + 1)}
        assert any(b[i : i + g] in grams_a for i in range(len(b) - g + 1))
        assert r.n_shared_grams >= 1
    # Guarantee direction: build the exact inverted index of
    # (GRAM+WINDOW-1)-char runs and check recall of uncapped pairs.
    long = g + D.SUBSTR_WINDOW - 1
    by_gram: dict[str, set[int]] = {}
    for did, t in docs.items():
        for i in range(len(t) - long + 1):
            by_gram.setdefault(t[i : i + long], set()).add(did)
    expected = set()
    for ds in by_gram.values():
        if 2 <= len(ds) <= D.SUBSTR_CAP:
            s = sorted(ds)
            for i, x in enumerate(s):
                for y in s[i + 1 :]:
                    expected.add((x, y))
    got = {(r.doc_a, r.doc_b) for r in pairs}
    missed = expected - got
    # Capped boilerplate grams may legitimately drop a few pairs.
    assert len(missed) <= max(1, len(expected) // 20), (
        f"winnow recall too low: missed {len(missed)}/{len(expected)}"
    )


def test_dedup_semantic_keep_lowest_id(spark):
    import numpy as np

    rows = S.dedup_semantic(spark, SF_DIR).collect()
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    }
    assert len(rows) == len(emb)
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    for cell_rows in by_cell.values():
        cell_rows.sort(key=lambda r: r.vec_id)
        # The cell's first member has no lower-id mate and is kept.
        assert cell_rows[0].max_lower_cos is None
        assert not cell_rows[0].is_semantic_dup
        for r in cell_rows[1:]:
            lower = [c.vec_id for c in cell_rows if c.vec_id < r.vec_id]
            v = emb[r.vec_id]
            best = max(
                float(emb[o] @ v / (np.linalg.norm(emb[o]) * np.linalg.norm(v)))
                for o in lower
            )
            assert r.max_lower_cos == pytest.approx(best, rel=1e-9)
            assert r.is_semantic_dup == (r.max_lower_cos >= S.SEMANTIC_THRESHOLD)


def test_embedding_outliers_match_numpy(spark):
    import numpy as np

    rows = S.embedding_outliers(spark, SF_DIR).collect()
    data = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label: dict[int, list] = {}
    for r in data:
        by_label.setdefault(r.label, []).append(
            (r.vec_id, np.array(r.embedding, dtype=np.float64))
        )
    expected = {}
    for label, members in by_label.items():
        cen = np.sum(
            [np.floor(v * 1_000_000) for _, v in members], axis=0
        )
        scored = sorted(
            (
                (float(v @ cen / (np.linalg.norm(v) * np.linalg.norm(cen))), vid)
                for vid, v in members
            ),
        )
        expected[label] = [vid for _, vid in scored[: S.OUTLIER_K]]
    for r in rows:
        assert expected[r.label][r.rank - 1] == r.vec_id
    per_label: dict[int, list] = {}
    for r in rows:
        per_label.setdefault(r.label, []).append(r)
    for rs in per_label.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        cos = [r.cos_centroid for r in rs]
        assert cos == sorted(cos)


def test_similarity_pq_rerank_and_recall(spark):
    """PQ/ADC results must be exactly-ranked within the shortlist
    (rerank is true cosine), codes must be valid, and recall vs the
    exact baseline must clear the floor expected for untrained
    codebooks on an isotropic corpus (the ADC shortlist is 5x the
    reported k, so even weak codes recover a good fraction)."""
    from ensembl_lakehouse_spark.operators import pq as PQ

    exact = {
        (r.q_id, r.vec_id) for r in S.similarity_topk(spark, SF_DIR).collect()
    }
    rows = PQ.similarity_pq(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    assert len(by_q) == S.N_QUERIES
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, S.TOP_K + 1))
        cos = [r.cosine for r in rs]
        assert cos == sorted(cos, reverse=True)
        assert all(r.adc_dist >= 0 for r in rs)
    got = {(r.q_id, r.vec_id) for r in rows}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.3, f"PQ recall collapsed: {recall}"


def test_pq_codes_compress(spark):
    """Every corpus vector encodes to PQ_M in-range codes, and the
    codebook argmin is consistent with a numpy recompute."""
    import numpy as np
    from ensembl_lakehouse_spark.operators import pq as PQ
    from pyspark.sql import functions as F2

    enc = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .where(F2.col("vec_id") >= S.N_QUERIES)
        .select("vec_id", "embedding",
                F2.expr(PQ._codes_spark("embedding")).alias("codes"))
        .limit(25)
        .collect()
    )
    cb = np.array(PQ.CODEBOOKS)  # (M, K, SUB)
    for r in enc:
        v = np.array(r.embedding, dtype=np.float64)
        assert len(r.codes) == PQ.PQ_M
        for m, code in enumerate(r.codes):
            assert 0 <= code < PQ.PQ_K
            sub = v[m * PQ.PQ_SUB:(m + 1) * PQ.PQ_SUB]
            d = ((cb[m] - sub) ** 2).sum(axis=1)
            assert code == int(np.argmin(d))


def test_incremental_dedup_consistent_with_pairwise(spark):
    """dedup_incremental's near matches must agree with the global
    dedup_near pair list restricted to cross-split (new x corpus)
    pairs, and its exact matches with fp-equality."""
    from ensembl_lakehouse_spark.operators import dedup as D

    inc = {r.doc_id: (r.verdict, r.match_id)
           for r in D.dedup_incremental(spark, SF_DIR).collect()}
    assert inc
    pairs = D.dedup_near(spark, SF_DIR).collect()
    cross: dict[int, int] = {}
    for p in pairs:
        for new, old in ((p.doc_a, p.doc_b), (p.doc_b, p.doc_a)):
            if new % D.INCR_MOD == 0 and old % D.INCR_MOD != 0:
                cross[new] = min(cross.get(new, old), old)
    for doc_id, (verdict, match_id) in inc.items():
        assert doc_id % D.INCR_MOD == 0
        if verdict == "near":
            assert cross.get(doc_id) == match_id
        elif verdict == "new":
            assert doc_id not in cross
        else:
            assert verdict == "exact" and match_id is not None


def test_source_overlap_totals_match_pair_count(spark):
    """Matrix cells partition the verified near-dup pairs; labels
    are canonically ordered; diagonal flag correct."""
    cells = D.source_overlap(spark, SF_DIR).collect()
    n_pairs = D.dedup_near(spark, SF_DIR).count()
    assert sum(c.n_dup_pairs for c in cells) == n_pairs
    for c in cells:
        assert c.source_x <= c.source_y
        assert c.within_source == (c.source_x == c.source_y)


def test_dedup_savings_consistent_with_dedup_exact(spark):
    row = D.dedup_savings(spark, SF_DIR).collect()[0]
    flags = D.dedup_exact(spark, SF_DIR).collect()
    assert row.n_docs == len(flags)
    assert row.n_kept == sum(1 for f in flags if f.is_canonical)
    assert row.n_kept + row.n_removed == row.n_docs
    assert row.tokens_kept + row.tokens_removed == row.tokens_total
    # independent token-mass pin: a tokenization bug mirrored into
    # the DuckDB oracle would pass the gate; this recompute from the
    # raw texts (same trim+\s+ convention) would not
    import re

    from ensembl_lakehouse_spark.sources.tables import load_table

    texts = [
        r.text
        for r in load_table(spark, SF_DIR, "documents").collect()
        if r.text.strip()
    ]
    want = sum(len(re.split(r"\s+", t.strip(" "))) for t in texts)
    assert row.tokens_total == want


def test_component_size_histogram_partitions_components(spark):
    hist = D.component_size_histogram(spark, SF_DIR).collect()
    comp = D.components_recursive(spark, SF_DIR).collect()
    from collections import Counter

    sizes = Counter(Counter(r.component for r in comp).values())
    assert {(h.component_size, h.n_components) for h in hist} == set(sizes.items())
    assert all(h.component_size >= 2 for h in hist)  # paired docs only


def test_embedding_norm_audit_matches_numpy(spark):
    import numpy as np

    from ensembl_lakehouse_spark.operators.similarity import embedding_norm_audit
    from ensembl_lakehouse_spark.sources.tables import load_table

    row = embedding_norm_audit(spark, SF_DIR).collect()[0]
    vecs = [
        np.asarray(r.embedding, dtype=np.float64)
        for r in load_table(spark, SF_DIR, "embeddings").collect()
    ]
    norms = [float(np.sqrt((v * v).sum())) for v in vecs]
    assert row.n_vectors == len(vecs)
    assert row.n_distinct_dims == len({v.shape[0] for v in vecs})
    assert row.n_zero_vectors == sum(1 for n in norms if n == 0.0)
    assert abs(row.min_norm - min(norms)) < 1e-9
    assert abs(row.max_norm - max(norms)) < 1e-9
    assert abs(row.mean_norm - sum(norms) / len(norms)) < 1e-6
