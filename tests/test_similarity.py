"""Similarity-search checks: brute-force self-similarity, ANN recall vs the
exact baseline (SURVEY §5.2 item 4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.operators import similarity
from mapreducefw_spark.queries._util import t


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return similarity.as_double_vecs(t(spark, sf_dir, "embeddings")).cache()


def test_top1_of_self_is_self(vecs):
    q = vecs.filter(F.col("vid") < 5)
    top = similarity.brute_force_topk(vecs, q, k=1, exclude_self=False).collect()
    for r in top:
        assert r.nid == r.qid and r.sim == pytest.approx(1.0, abs=1e-5)


def test_cosine_symmetric_and_bounded(vecs):
    q = vecs.filter(F.col("vid") < 10)
    top = similarity.brute_force_topk(vecs, q, k=5).collect()
    assert len(top) == 50
    assert all(-1.0 <= r.sim <= 1.0 for r in top)


def _recall(ann_rows, exact_rows):
    exact = {}
    for r in exact_rows:
        exact.setdefault(r.qid, set()).add(r.nid)
    hits = total = 0
    for r in ann_rows:
        total += 1
        hits += r.nid in exact[r.qid]
    return hits / total


def test_ivf_recall_vs_brute_force(vecs):
    q = vecs.filter(F.col("vid") < 10)
    exact = similarity.brute_force_topk(vecs, q, k=5).collect()
    ann = similarity.ivf_topk(vecs, q, k=5, n_cells=16, nprobe=8).collect()
    assert _recall(ann, exact) >= 0.6  # measured ~0.85 at nprobe=4; margin for data drift


def test_ivf_kmeans_refinement_recall(vecs):
    q = vecs.filter(F.col("vid") < 10)
    exact = similarity.brute_force_topk(vecs, q, k=5).collect()
    ann = similarity.ivf_topk(vecs, q, k=5, n_cells=16, nprobe=4, kmeans_iters=2).collect()
    assert _recall(ann, exact) >= 0.6


def test_lsh_returns_valid_neighbors(vecs):
    q = vecs.filter(F.col("vid") < 10)
    rows = similarity.random_hyperplane_topk(vecs, q, k=5, dim=64, n_planes=4).collect()
    # bucketing may prune aggressively; whatever it returns must be valid + ranked
    seen = {}
    for r in rows:
        assert -1.0 <= r.sim <= 1.0
        seen.setdefault(r.qid, []).append((r.rk, r.sim))
    for ranked in seen.values():
        sims = [s for _, s in sorted(ranked)]
        assert sims == sorted(sims, reverse=True)
