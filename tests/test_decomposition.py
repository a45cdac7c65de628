"""Numeric pin for the distributed PCA (operators/decomposition.py):
the map-side-Gram + driver power iteration must agree with
numpy.linalg.eigh computed directly on the same vectors (up to the
documented fixed-point quantization), and be deterministic across
repartitionings (the exact-integer accumulation claim)."""

import numpy as np
import pandas as pd
import pytest

from ensembl_lakehouse_spark.operators import decomposition as DC
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def pca_rows(spark):
    return DC.embedding_pca(spark, SF_DIR).collect()


@pytest.fixture(scope="module")
def reference_eig(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    mat = np.asarray([np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()])
    # Same quantization the operator applies, so the comparison
    # isolates the ALGORITHM, not float32→fixed-point rounding.
    q = np.rint(mat * DC.PCA_SCALE) / DC.PCA_SCALE
    cov = np.cov(q, rowvar=False, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1]
    return vals[order], vecs[:, order], cov


def test_matches_numpy_eigh(pca_rows, reference_eig):
    vals, vecs, cov = reference_eig
    for c in range(DC.PCA_COMPONENTS):
        got = np.array(
            [r.weight for r in sorted(
                (r for r in pca_rows if r.component == c), key=lambda r: r.dim
            )]
        )
        lam = next(r.eigenvalue for r in pca_rows if r.component == c)
        # Eigenvector up to sign: |cos| ≈ 1.
        assert abs(float(got @ vecs[:, c])) > 0.999, f"component {c} direction"
        assert lam == pytest.approx(vals[c], rel=1e-6), f"component {c} eigenvalue"
        ratio = next(r.explained_ratio for r in pca_rows if r.component == c)
        assert ratio == pytest.approx(vals[c] / np.trace(cov), rel=1e-6)


def test_deterministic_across_partitioning(spark, pca_rows):
    """The exact-integer accumulation makes the result bit-identical
    regardless of how the input is partitioned."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb.repartition(13).write.mode("overwrite").parquet("/tmp/elh_pca_repart")
    import shutil

    # Point the operator at the repartitioned copy via a shim dir.
    import os
    shim = "/tmp/elh_pca_shim"
    os.makedirs(shim, exist_ok=True)
    src = "/tmp/elh_pca_repart"
    dst = os.path.join(shim, "embeddings.parquet")
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    again = DC.embedding_pca(spark, shim).collect()
    key = lambda r: (r.component, r.dim)
    a = {key(r): (r.weight, r.eigenvalue) for r in pca_rows}
    b = {key(r): (r.weight, r.eigenvalue) for r in again}
    assert a == b, "PCA must be bit-identical under repartitioning"
