"""Distributed PCA building blocks: one-pass Gram/mean accumulation and a
deterministic power iteration.

The scale pattern (the point of this module): a covariance matrix over N
vectors never materializes N x d x d anything — each Arrow batch
contributes ONE d x d Gram partial (numpy ``X.T @ X``, BLAS syrk), the
batch mean-sum and the batch count, all flattened to (cell, val) rows, so
the shuffle carries at most (d^2 + d + 1) x n_batches tiny rows and the
driver collects exactly d^2 + d + 1 aggregated cells (a model-sized
artifact, the tokenizer-merge-table idiom: d=64 -> 4161 doubles). This is
the standard distributed-covariance formulation (e.g. Spark MLlib's
RowMatrix.computeGramianMatrix; Halko et al. 2011 §5 for the randomized
relatives).

Power iteration runs in the driver on the d x d covariance — O(d^2) per
step, data-free — with a FIXED iteration count and a deterministic start
(uniform vector), so results are reproducible run to run. Float shuffle
sums make the whole family rows-only by design; tests/test_pipeline44.py
pins it against numpy.linalg.eigh on the same parquet.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Fixed-count fixpoint: deterministic, data-free O(d^2) steps. 500 because
# near-isotropic corpora (random-ish embeddings: the fixture's top eigengap
# ratio is ~0.93) converge as ratio^k — 0.93^500 ~ 2e-16, so the pins stay
# tight even without a spectral gap; the cost is 500 * d^2 driver flops.
POWER_ITERS = 500


def gram_cells(vecs: DataFrame, dim: int, vec_col: str = "vec") -> DataFrame:
    """(cell, val) aggregated sufficient statistics of the vector column:
    cells [0, d^2) hold sum(x_i * x_j) row-major, [d^2, d^2+d) hold
    sum(x_i), cell d^2+d holds the count. One map pass, one shuffle of
    (d^2+d+1)-bounded partials per batch, map-side combined."""
    import pandas as pd

    n_cells = dim * dim + dim + 1

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            vals = np.empty(n_cells, dtype=np.float64)
            vals[: dim * dim] = (x.T @ x).ravel()
            vals[dim * dim : dim * dim + dim] = x.sum(axis=0)
            vals[-1] = float(len(pdf))
            yield pd.DataFrame({"cell": np.arange(n_cells), "val": vals})

    return (
        vecs.select(vec_col)
        .mapInPandas(kernel, "cell int, val double")
        .groupBy("cell")
        .agg(F.sum("val").alias("val"))
    )


def covariance_from_cells(rows: list[tuple[int, float]], dim: int):
    """(C, mean, n) from collected (cell, val) rows: population covariance
    C = G/n - mean mean^T. Returns (None, None, 0) for an empty input."""
    if not rows:
        return None, None, 0
    vals = np.zeros(dim * dim + dim + 1, dtype=np.float64)
    for cell, val in rows:
        vals[cell] = val
    n = int(round(vals[-1]))
    if n == 0:
        return None, None, 0
    g = vals[: dim * dim].reshape(dim, dim)
    mean = vals[dim * dim : dim * dim + dim] / n
    cov = g / n - np.outer(mean, mean)
    # numerically symmetrize: G/n is symmetric up to summation rounding
    cov = (cov + cov.T) / 2.0
    return cov, mean, n


def power_iteration(cov: np.ndarray, n_iters: int = POWER_ITERS):
    """(eigenvector, eigenvalue) of the dominant component, deterministic:
    uniform start, fixed iteration count, sign fixed so the largest-|.|
    loading (lowest index on ties) is positive."""
    d = cov.shape[0]
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(n_iters):
        w = cov @ v
        nrm = float(np.linalg.norm(w))
        if nrm == 0.0:
            break  # cov annihilates v (zero matrix): keep the uniform vector
        v = w / nrm
    lam = float(v @ cov @ v)
    pivot = int(np.argmax(np.abs(v)))  # first index on exact ties
    if v[pivot] < 0:
        v = -v
    return v, lam
