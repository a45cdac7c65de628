"""The Pandas-UDF seam must agree with the JVM expression it can
replace — equivalence within float tolerance, exercised through a
real Arrow round-trip."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ensembl_lakehouse_spark.functions.pandas_ext import cosine_udf
from ensembl_lakehouse_spark.functions.vectors import cosine_similarity
from ensembl_lakehouse_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_cosine_udf_matches_jvm_expression(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_vec"))
    pairs = (
        emb.where(F.col("vec_id") > 0)
        .limit(50)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            cosine_similarity("q_vec", "embedding").alias("jvm"),
            cosine_udf("q_vec", "embedding").alias("py"),
        )
    )
    for r in pairs.collect():
        assert math.isclose(r.jvm, r.py, rel_tol=1e-12, abs_tol=1e-12), r


def test_ols_per_group_matches_jvm_closed_form(spark):
    """applyInPandas OLS must agree with the exact-decimal-moment
    closed form (analytics.corr_price_qty) within float tolerance —
    the grouped-map seam's numerics contract."""
    import math

    from ensembl_lakehouse_spark.functions.pandas_ext import ols_per_group
    from ensembl_lakehouse_spark.operators.analytics import corr_price_qty
    from ensembl_lakehouse_spark.sources.tables import load_table
    from tests.conftest import SF_DIR

    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    fitted = {
        r.l_returnflag: (r.n, r.slope, r.intercept)
        for r in ols_per_group(li, "l_returnflag", "l_quantity", "l_extendedprice").collect()
    }
    exact = {
        r.l_returnflag: (r.n, r.slope, r.intercept)
        for r in corr_price_qty(spark, SF_DIR).collect()
    }
    assert set(fitted) == set(exact)
    for flag, (n, slope, intercept) in exact.items():
        fn, fs, fi = fitted[flag]
        assert fn == n
        assert math.isclose(fs, slope, rel_tol=1e-9), (flag, fs, slope)
        assert math.isclose(fi, intercept, rel_tol=1e-9), (flag, fi, intercept)
