"""Pins for the round-12 distributed-PCA batch (pipeline44).

``pca_top_component`` is rows-only by design (float shuffle sums), so
the correctness evidence is a numpy third implementation on the SAME
parquet: the distributed Gram/mean/count cells must reproduce numpy's
covariance to summation-order slack, and the power-iteration output must
match ``numpy.linalg.eigh``'s dominant eigenpair — eigenvalue, |cosine|
alignment, explained ratio — plus the engine-free self-consistency
residual ||Cv - lambda v||. Unit cases pin the power iteration on
matrices with known spectra and the degenerate zero/empty regimes.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from mapreducefw_spark.operators.pca import (
    covariance_from_cells,
    power_iteration,
)
from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.queries.pipeline44 import EMB_DIM

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _numpy_cov():
    rows = duckdb.sql(
        f"SELECT embedding FROM '{SF_DIR}/embeddings.parquet' "
        "WHERE embedding IS NOT NULL "
        f"  AND len(embedding) = {EMB_DIM} "
        "  AND len(list_filter(embedding, x -> x IS NULL)) = 0"
    ).fetchall()
    x = np.array([r[0] for r in rows], dtype=np.float64)
    mean = x.mean(axis=0)
    cov = (x.T @ x) / len(x) - np.outer(mean, mean)
    return (cov + cov.T) / 2.0, len(x)


def test_pca_matches_numpy_eigh(spark):
    got = QUERIES["pca_top_component"](spark, SF_DIR).collect()
    cov, n = _numpy_cov()
    evals, evecs = np.linalg.eigh(cov)
    lam_true, v_true = evals[-1], evecs[:, -1]

    assert len(got) == EMB_DIM
    assert {r["dim_idx"] for r in got} == set(range(EMB_DIM))
    v = np.array([r["loading"] for r in sorted(got, key=lambda r: r["dim_idx"])])
    lam = got[0]["eigenvalue"]
    ratio = got[0]["explained_variance_ratio"]

    assert got[0]["n_vectors"] == n
    # spectrum-aware tolerance: power iteration converges as (l2/l1)^k, so
    # derive the bound from the MEASURED gap instead of guessing a constant
    from mapreducefw_spark.operators.pca import POWER_ITERS

    gap = float(evals[-2] / evals[-1])
    tol = max(1e-9, gap ** POWER_ITERS * 10)
    assert lam == pytest.approx(lam_true, rel=max(1e-9, tol**2))
    assert abs(float(v @ v_true)) == pytest.approx(1.0, abs=tol)
    assert ratio == pytest.approx(lam_true / np.trace(cov), rel=1e-6)
    # self-consistency, engine-free: v is a unit eigenvector of C
    assert float(np.linalg.norm(v)) == pytest.approx(1.0, abs=1e-9)
    assert float(np.linalg.norm(cov @ v - lam * v)) <= 1e-6 * max(lam, 1e-12)
    # sign convention: the largest-|.| loading is positive
    assert v[int(np.argmax(np.abs(v)))] > 0


def test_gram_cells_reproduce_numpy_covariance(spark):
    # the distributed sufficient statistics themselves, not just the
    # eigenpair: covariance_from_cells(collect) ~= numpy covariance
    from mapreducefw_spark.operators.pca import gram_cells
    from pyspark.sql import functions as F

    vecs = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(
            F.col("embedding").isNotNull()
            & (F.size("embedding") == EMB_DIM)
            & ~F.exists("embedding", lambda x: x.isNull())
        )
        .select(F.col("embedding").cast("array<double>").alias("vec"))
    )
    rows = [(r["cell"], r["val"]) for r in gram_cells(vecs, EMB_DIM).collect()]
    cov, mean, n = covariance_from_cells(rows, EMB_DIM)
    cov_true, n_true = _numpy_cov()
    assert n == n_true
    assert np.allclose(cov, cov_true, rtol=1e-9, atol=1e-12)


def test_power_iteration_known_spectrum():
    # diagonal matrix: dominant axis is e_2 with eigenvalue 5
    c = np.diag([1.0, 2.0, 5.0, 0.5])
    v, lam = power_iteration(c)
    assert lam == pytest.approx(5.0, rel=1e-12)
    assert v == pytest.approx(np.array([0, 0, 1.0, 0]), abs=1e-9)


def test_power_iteration_rotated_spectrum():
    rng = np.random.default_rng(7)
    q, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    c = q @ np.diag([9.0, 3.0, 1.0, 0.5, 0.1, 0.01]) @ q.T
    v, lam = power_iteration(c)
    assert lam == pytest.approx(9.0, rel=1e-9)
    assert abs(float(v @ q[:, 0])) == pytest.approx(1.0, abs=1e-9)


def test_power_iteration_zero_matrix_and_empty_cells():
    v, lam = power_iteration(np.zeros((4, 4)))
    assert lam == 0.0
    assert float(np.linalg.norm(v)) == pytest.approx(1.0)
    cov, mean, n = covariance_from_cells([], 4)
    assert (cov, mean, n) == (None, None, 0)


def test_pca_empty_input_returns_empty_frame(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "emptydb"
    d.mkdir()
    src = pa.parquet.read_table(f"{SF_DIR}/embeddings.parquet")
    pq.write_table(src.slice(0, 0), d / "embeddings.parquet")
    out = QUERIES["pca_top_component"](spark, str(d))
    assert out.count() == 0
    assert out.columns == [
        "dim_idx",
        "loading",
        "eigenvalue",
        "explained_variance_ratio",
        "n_vectors",
    ]
