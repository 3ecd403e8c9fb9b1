"""Round-12 registrations, batch 5: distributed PCA over the embedding
corpus — the one-pass Gram pattern.

``pca_top_component`` reduces the embeddings table to its dominant
principal axis: per-dimension loadings of the top eigenvector of the
population covariance, the eigenvalue, and the explained-variance ratio.
PCA is the workhorse of embedding-corpus diagnostics (anisotropy /
"rogue dimension" checks, whitening decisions, ABTT postprocessing per
Mu & Viswanath 2018) and the basis of the dimensionality choices the
PQ/IVF tier already makes.

Rows-only by design: the sufficient statistics are float shuffle sums
(batch Gram partials), so no SQL oracle can be exact. Pinned in
tests/test_pipeline44.py against numpy.linalg.eigh ON THE SAME PARQUET:
eigenvalue, alignment |cos| of the eigenvectors, explained ratio, and
the self-consistency residual ||Cv - lambda v||.

Scale posture (100 TB of embeddings): the corpus is touched ONCE, by an
Arrow-batched numpy kernel emitting (d^2+d+1)-bounded partial rows per
batch (BLAS syrk per batch — no N x d^2 anything); the single shuffle
carries those partials map-side combined; the driver collects exactly
d^2+d+1 cells (4161 doubles at d=64 — model-sized, the
tokenizer-merge-table idiom) and runs a data-free O(d^2)-per-step power
iteration. See operators/pca.py.

Semantic contract with the reference engine: map (per-chunk partial
sufficient statistics) -> shuffle by cell key -> reduce (sum) — exactly
the reference's Emit2/Reduce fold shape (`/root/reference/
MapReduceClient.h:47-51`), with the fixpoint on the reduced model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators import pca
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

EMB_DIM = 64  # the embeddings fixture dimensionality

_SCHEMA = (
    "dim_idx int, loading double, eigenvalue double, "
    "explained_variance_ratio double, n_vectors bigint"
)


@register("pca_top_component")
def pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal component of the embedding corpus: one Gram
    pass + driver-side power iteration. Rows with NULLs or the wrong
    dimensionality are excluded (they have no coordinates to project)."""
    import numpy as np

    vecs = (
        t(spark, sf_dir, "embeddings")
        .filter(
            F.col("embedding").isNotNull()
            & (F.size("embedding") == EMB_DIM)
            & ~F.exists("embedding", lambda x: x.isNull())
        )
        .select(F.col("embedding").cast("array<double>").alias("vec"))
    )
    cells = pca.gram_cells(vecs, EMB_DIM).collect()  # d^2+d+1 rows, model-sized
    cov, _, n = pca.covariance_from_cells(
        [(r["cell"], r["val"]) for r in cells], EMB_DIM
    )
    if n == 0:
        return spark.createDataFrame([], _SCHEMA)
    v, lam = pca.power_iteration(cov)
    trace = float(np.trace(cov))
    ratio = lam / trace if trace > 0 else 0.0
    rows = [
        (i, float(v[i]), lam, ratio, n) for i in range(EMB_DIM)
    ]
    return spark.createDataFrame(rows, _SCHEMA)
