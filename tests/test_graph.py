"""Unit tests: operators/graph (degree / PageRank / triangles over
the aggregated nation trade graph). The oracle differential is the
deep gate; these pin the graph invariants at sf0.001 and cross-check
the triangle count against a Python brute force on the collected
(dim-bounded) edge list."""

from __future__ import annotations

from itertools import combinations

from ensembl_lakehouse_spark.operators import graph as G
from tests.conftest import SF_DIR


def test_degree_in_out_totals_balance(spark):
    rows = G.graph_degree(spark, SF_DIR).collect()
    assert len(rows) == 25
    assert sum(r.out_degree for r in rows) == sum(r.in_degree for r in rows)
    assert sum(r.out_trades for r in rows) == sum(r.in_trades for r in rows)


def test_pagerank_bounds_and_dangling_leak(spark):
    rows = G.graph_pagerank(spark, SF_DIR).collect()
    assert len(rows) == 25
    n = len(rows)
    total = sum(r.rank for r in rows)
    floor_rank = (1.0 - G.PR_DAMP) / n
    for r in rows:
        assert floor_rank - 1e-12 <= r.rank < 1.0
        assert abs(r.rank_fp / G.PR_FP - r.rank) < 2.0 / G.PR_FP
    # mass is conserved up to dangling leak: total in ((1-d), 1].
    assert (1.0 - G.PR_DAMP) - 1e-9 < total <= 1.0 + 1e-9


def test_triangles_match_python_bruteforce(spark):
    edges = {
        (r.a, r.b)
        for r in G._trade_edges(spark, SF_DIR)
        .where("src <> dst")
        .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
        .distinct()
        .collect()
    }
    nodes = sorted({n for e in edges for n in e})
    expected: dict[str, int] = {}
    for a, b, c in combinations(nodes, 3):
        if {(a, b), (b, c), (a, c)} <= edges:
            for n in (a, b, c):
                expected[n] = expected.get(n, 0) + 1
    got = {
        r.node: r.n_triangles
        for r in G.graph_triangles(spark, SF_DIR).collect()
        if r.n_triangles
    }
    assert got == expected


def test_pagerank_full_is_a_probability_distribution(spark):
    """Dangling-mass redistribution: ranks sum to exactly 1 (up to
    the per-iteration fixed-point rounding), every rank at least the
    teleport floor, and the result matches a pure-Python full
    PageRank on the same extracted edge list."""
    rows = G.graph_pagerank_full(spark, SF_DIR).collect()
    n = len(rows)
    assert n == 25
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-6
    for r in rows:
        assert r.rank >= (1.0 - G.PR_DAMP) / n - 1e-12

    edges = {
        (r.src, r.dst)
        for r in G._trade_edges(spark, SF_DIR).where("src <> dst").collect()
    }
    nodes = sorted({r.node for r in rows})
    out = {v: sorted(d for s, d in edges if s == v) for v in nodes}
    rank = {v: 1.0 / n for v in nodes}
    fp = G.PR_FP
    for _ in range(G.PR_ITERS):
        mass = {v: 0 for v in nodes}
        for u in nodes:
            if out[u]:
                c = int((rank[u] / len(out[u])) * fp + 0.5)
                for v in out[u]:
                    mass[v] += c
        dm = sum(int(rank[u] * fp + 0.5) for u in nodes if not out[u])
        rank = {
            v: (1.0 - G.PR_DAMP) / n
            + G.PR_DAMP * (mass[v] / fp + dm / fp / n)
            for v in nodes
        }
    for r in rows:
        assert abs(r.rank - rank[r.node]) < 1e-9, r.node
