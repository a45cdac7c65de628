"""Property tests for the semantic cache-key canonicalizer.

The reference's equivalences (app/main.py:78-86): conjunct order and
keyword/identifier case don't affect the key; quoted literal case
does. Plus soundness fixes the reference lacks: operator/operand
association survives (token-sorting collisions cannot happen).
"""

from __future__ import annotations

from hypothesis import given, strategies as st

from ensembl_lakehouse_spark.plans.canonical import (
    cache_key,
    canonical_condition,
    canonical_fields,
)

_ident = st.sampled_from(["l_quantity", "l_discount", "l_orderkey", "gene_id"])
_op = st.sampled_from(["=", ">", "<", ">=", "<="])
_val = st.sampled_from(["1", "42", "'ENSG001'", "'abc'"])


@st.composite
def _conjuncts(draw):
    n = draw(st.integers(min_value=1, max_value=4))
    return [
        f"{draw(_ident)} {draw(_op)} {draw(_val)}"
        for _ in range(n)
    ]


@given(_conjuncts(), st.randoms())
def test_conjunct_order_invariant(conjs, rnd):
    shuffled = list(conjs)
    rnd.shuffle(shuffled)
    assert canonical_condition(" AND ".join(conjs)) == canonical_condition(
        " and ".join(shuffled)
    )


@given(_conjuncts())
def test_keyword_case_invariant(conjs):
    cond = " AND ".join(conjs)
    assert canonical_condition(cond.replace("l_", "L_")) == canonical_condition(cond)


def test_quoted_literal_case_is_preserved():
    assert canonical_condition("gene_id = 'ABC'") != canonical_condition("gene_id = 'abc'")


def test_association_preserved():
    # The reference's token-sort would collide these two.
    a = canonical_condition("l_quantity > 1 AND l_discount < 2")
    b = canonical_condition("l_quantity < 1 AND l_discount > 2")
    assert a != b


def test_or_not_split():
    a = canonical_condition("a = 1 OR b = 2")
    b = canonical_condition("b = 2 OR a = 1")
    # OR order is NOT canonicalized (conservative: no false hits)
    assert a != b
    # but whitespace/case still folds
    assert canonical_condition("A = 1   OR  B = 2") == a


def test_parenthesized_and_not_split():
    a = canonical_condition("(a = 1 AND b = 2) OR c = 3")
    assert "and" in a  # inner AND kept inside parens, not reordered
    assert canonical_condition("(b = 2 AND a = 1) OR c = 3") != ""


def test_fields_canonicalization():
    assert canonical_fields("a, b , C") == canonical_fields("c,b,a")
    assert canonical_fields("*") == canonical_fields(None) == canonical_fields("  ")


def test_cache_key_stability():
    k1 = cache_key("lineitem", "R", "a,b", "x = 1 AND y = 2")
    k2 = cache_key("LINEITEM", "R", "B,A", "Y = 2 and X = 1")
    assert k1 == k2
    assert k1 != cache_key("lineitem", "N", "a,b", "x = 1 AND y = 2")


# --- Literal-span hardening (round-4 advice): Spark's default parser
# treats "R" as a string literal (doubleQuotedIdentifiers=false) and
# honors backslash escapes inside literals; the canonicalizer must
# keep both byte-exact or two different queries share one cache key
# and submit_sql serves the first query's rows for the second.

def test_double_quoted_literal_case_is_preserved():
    from ensembl_lakehouse_spark.plans.canonical import canonical_sql_text

    upper = canonical_sql_text('SELECT * FROM lineitem WHERE l_returnflag = "R"')
    lower = canonical_sql_text('SELECT * FROM lineitem WHERE l_returnflag = "r"')
    assert upper != lower
    # keyword/whitespace folding still applies outside the literal
    assert upper == canonical_sql_text(
        'select  *  from LINEITEM where L_RETURNFLAG =  "R"'
    )


def test_backslash_escaped_quote_does_not_end_literal():
    from ensembl_lakehouse_spark.plans.canonical import canonical_sql_text

    # Under Spark parsing the literal is It'S HERE — the S HERE part
    # must not be case-folded as if it were outside the literal.
    a = canonical_sql_text(r"SELECT * FROM t WHERE c = 'It\'S HERE'")
    b = canonical_sql_text(r"SELECT * FROM t WHERE c = 'It\'s here'")
    assert a != b
    assert "S HERE" in a and "s here" in b


def test_condition_double_quoted_literal_preserved():
    assert canonical_condition('flag = "R"') != canonical_condition('flag = "r"')


def test_and_inside_double_quoted_literal_not_split():
    a = canonical_condition('note = "x and y" AND k = 1')
    b = canonical_condition('k = 1 AND note = "x and y"')
    assert a == b
    assert 'x and y' in a


def test_and_split_without_surrounding_spaces():
    # parenthesized conjuncts glued to AND still split at top level
    assert canonical_condition("(a = 1)AND(b = 2)") == canonical_condition(
        "(b = 2) and (a = 1)"
    )
    # but identifiers containing 'and' are not split
    assert "android" in canonical_condition("android = 1")
