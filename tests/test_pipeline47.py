"""Pins for the round-12 classifier-evaluation tier (pipeline47).

A pure-Python third implementation rescores the corpus from the parquet
(hashlib md5 buckets, the same dyadic weights) and recomputes every
confusion cell, calibration bin, and the kappa contingency EXACTLY.
Metric properties are pinned where the fixture can't discriminate:
recall is monotone along the threshold grid, every threshold's four
cells partition the corpus, kappa is 1 for identical raters / 0 for the
analytic independent table / in [-1, 1] always.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.queries.pipeline16 import STOPWORDS
from mapreducefw_spark.queries.pipeline38 import QC_BUCKETS, _QC_BIAS, _QC_W
from mapreducefw_spark.queries.pipeline47 import (
    CAL_BIN_HI,
    CAL_BIN_LO,
    PR_THRESHOLDS,
)

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _passes(toks) -> int:
    import re

    n = len(toks)
    if not (20 <= n <= 1000):
        return 0
    if not (2 <= sum(len(x) for x in toks) / n <= 12):
        return 0
    if sum(1 for x in toks if re.search("[a-zA-Z]", x)) / n < 0.8:
        return 0
    return 1 if sum(1 for x in toks if x in STOPWORDS) >= 2 else 0


def _scored():
    rows = duckdb.sql(
        f"SELECT text FROM '{SF_DIR}/documents.parquet' WHERE text IS NOT NULL"
    ).fetchall()
    out = []
    for (text,) in rows:
        toks = [w for w in text.split(" ") if w != ""]
        if not toks:
            continue
        logit = _QC_BIAS
        for tk in toks:
            b = int(hashlib.md5(tk.encode()).hexdigest()[:12], 16) % QC_BUCKETS
            logit += _QC_W[b]
        out.append((logit, _passes(toks)))
    return out


def test_pr_curve_matches_pure_python(spark):
    got = {
        r["threshold"]: r
        for r in QUERIES["classifier_pr_curve"](spark, SF_DIR).collect()
    }
    scored = _scored()
    assert set(got) == set(PR_THRESHOLDS)
    prev_recall = 1.1
    for thr in sorted(PR_THRESHOLDS):
        tp = sum(1 for lg, y in scored if lg > thr and y == 1)
        fp = sum(1 for lg, y in scored if lg > thr and y == 0)
        fn = sum(1 for lg, y in scored if lg <= thr and y == 1)
        tn = sum(1 for lg, y in scored if lg <= thr and y == 0)
        r = got[thr]
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, fn, tn)
        assert tp + fp + fn + tn == len(scored)  # cells partition the corpus
        if tp + fn > 0:
            assert r["recall_"] == tp / (tp + fn)
            assert r["recall_"] <= prev_recall + 1e-15  # monotone in threshold
            prev_recall = r["recall_"]
        if tp + fp > 0:
            assert r["precision_"] == tp / (tp + fp)


def test_calibration_bins_match_pure_python(spark):
    import math

    got = {
        r["bin"]: r
        for r in QUERIES["score_calibration_bins"](spark, SF_DIR).collect()
    }
    bins = {}
    for lg, y in _scored():
        b = max(CAL_BIN_LO, min(CAL_BIN_HI, math.floor(lg * 2)))
        n, p, s = bins.get(b, (0, 0, 0.0))
        bins[b] = (n + 1, p + y, s + lg)
    assert set(got) == set(bins)
    for b, (n, p, s) in bins.items():
        r = got[b]
        assert (r["n_docs"], r["n_pass"]) == (n, p)
        assert r["pass_rate"] == p / n
        # logits are dyadic (multiples of 1/64): sums are exact, so the
        # python accumulation reproduces the engine bit-for-bit
        assert r["mean_logit"] == s / n


def test_kappa_matches_pure_python(spark):
    got = QUERIES["cohens_kappa_rules"](spark, SF_DIR).collect()
    assert len(got) == 1
    r = got[0]
    scored = _scored()
    n11 = sum(1 for lg, y in scored if lg > 0 and y == 1)
    n10 = sum(1 for lg, y in scored if lg > 0 and y == 0)
    n01 = sum(1 for lg, y in scored if lg <= 0 and y == 1)
    n00 = sum(1 for lg, y in scored if lg <= 0 and y == 0)
    n = len(scored)
    assert (r["n"], r["n11"], r["n10"], r["n01"], r["n00"]) == (
        n,
        n11,
        n10,
        n01,
        n00,
    )
    po = (n11 + n00) / n
    pe = ((n11 + n10) / n) * ((n11 + n01) / n) + ((n01 + n00) / n) * (
        (n10 + n00) / n
    )
    assert r["po"] == po
    assert r["pe"] == pe
    if 1.0 - pe != 0.0:
        assert r["kappa"] == (po - pe) / (1.0 - pe)
    assert -1.0 <= r["kappa"] <= 1.0


def _kappa(n11, n10, n01, n00):
    n = n11 + n10 + n01 + n00
    po = (n11 + n00) / n
    pe = ((n11 + n10) / n) * ((n11 + n01) / n) + ((n01 + n00) / n) * ((n10 + n00) / n)
    return (po - pe) / (1.0 - pe) if 1.0 - pe != 0.0 else None


def test_kappa_analytic_cases():
    assert _kappa(40, 0, 0, 60) == pytest.approx(1.0)  # perfect agreement
    # independence: margins 50/50 each way, agreement exactly chance
    assert _kappa(25, 25, 25, 25) == pytest.approx(0.0)
    # perfect DISagreement with 50/50 margins
    assert _kappa(0, 50, 50, 0) == pytest.approx(-1.0)
