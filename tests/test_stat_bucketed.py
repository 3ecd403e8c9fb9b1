"""Width-1 equality pins for the bucketed drift tests (pipeline20).

The bucketed KS / Mann-Whitney variants are the documented 100 TB escape
hatch for the exact forms' unpartitioned distinct-value-grid cumsum
(pipeline19). Their correctness contract: coarsening with width=1 is the
identity on an integer axis, so the bucketed pipeline must reproduce the
exact forms BIT-FOR-BIT — any drift means the bucketing changed more than
the axis. Also pins the conservative direction at a real width: a
bucketed D statistic can only lose boundary resolution, never gain it.
"""

from __future__ import annotations

from mapreducefw_spark.queries.pipeline19 import (
    _ks_frame,
    _mwu_frame,
    _src_value_counts,
    ks_two_sample,
    mann_whitney_u,
)
from mapreducefw_spark.queries.pipeline20 import (
    BUCKET_WIDTH,
    ks_two_sample_bucketed,
    mann_whitney_u_bucketed,
)


def test_ks_width1_equals_exact(spark, sf_dir):
    exact = ks_two_sample(spark, sf_dir).collect()
    w1 = _ks_frame(_src_value_counts(spark, sf_dir, width=1)).collect()
    assert [tuple(r) for r in w1] == [tuple(r) for r in exact]


def test_mwu_width1_equals_exact(spark, sf_dir):
    exact = mann_whitney_u(spark, sf_dir).collect()
    w1 = _mwu_frame(_src_value_counts(spark, sf_dir, width=1)).collect()
    assert [tuple(r) for r in w1] == [tuple(r) for r in exact]


def test_bucketed_ks_is_conservative(spark, sf_dir):
    exact = ks_two_sample(spark, sf_dir).collect()[0]
    bucketed = ks_two_sample_bucketed(spark, sf_dir).collect()[0]
    # same samples, same critical value; D evaluated on fewer boundaries
    assert (bucketed["n0"], bucketed["n1"]) == (exact["n0"], exact["n1"])
    assert bucketed["d_crit_95"] == exact["d_crit_95"]
    assert bucketed["d_stat"] <= exact["d_stat"] + 1e-12


def test_bucketed_mwu_same_samples(spark, sf_dir):
    exact = mann_whitney_u(spark, sf_dir).collect()[0]
    bucketed = mann_whitney_u_bucketed(spark, sf_dir).collect()[0]
    assert (bucketed["n0"], bucketed["n1"]) == (exact["n0"], exact["n1"])
    # coarsening only regroups ties; rank sums stay multiples of 0.5
    assert (bucketed["u0"] * 2) == int(bucketed["u0"] * 2)
    assert BUCKET_WIDTH > 1
