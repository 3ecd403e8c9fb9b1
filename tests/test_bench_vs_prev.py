"""Unit tests for bench._vs_prev — the round-over-round comparison block.

r12 verdict order #4: the calibrator drift must be a true median (not the
upper-median sorted[len//2] pick, which with 2 surviving calibrators
reported the max of two) and a degraded basis (<3 calibrators) must be
visible in the artifact. Pure-Python, no Spark session.
"""

from __future__ import annotations

import bench


def _prev(queries, value=None):
    return {"queries": queries, "value": value or sum(queries.values())}


class TestCalibratorMedian:
    def test_all_three_calibrators_median(self):
        # ratios 1.0, 2.0, 4.0 -> median 2.0 (NOT mean 2.333, NOT max 4.0)
        per = {"q1_pricing_summary": 1.0, "snapshot_diff": 2.0, "mr_wordcount": 4.0}
        prev = _prev({"q1_pricing_summary": 1.0, "snapshot_diff": 1.0, "mr_wordcount": 1.0})
        block = bench._vs_prev(per, 7.0, prev, "BENCH_rX.json")
        assert block["calibrator_drift"] == 2.0
        assert block["calibrator_n"] == 3
        assert "calibrator_degraded" not in block

    def test_two_of_three_is_mean_of_pair_not_max(self):
        # the r12-flagged case: 2 of 3 present. sorted[len//2] would pick
        # the larger (2.0); statistics.median of two averages them (1.5).
        per = {"q1_pricing_summary": 1.0, "snapshot_diff": 2.0, "mr_wordcount": 3.0}
        prev = _prev({"q1_pricing_summary": 1.0, "snapshot_diff": 1.0})  # no mr_wordcount
        block = bench._vs_prev(per, 6.0, prev, "BENCH_rX.json")
        assert block["calibrator_drift"] == 1.5
        assert block["calibrator_n"] == 2
        assert block["calibrator_degraded"] is True

    def test_zero_prev_time_excluded_not_crashed(self):
        # a 0 prev time must drop the calibrator (no ZeroDivisionError)
        per = {"q1_pricing_summary": 1.2, "snapshot_diff": 2.0, "mr_wordcount": 3.0}
        prev = _prev(
            {"q1_pricing_summary": 1.0, "snapshot_diff": 0, "mr_wordcount": 0},
            value=1.0,
        )
        block = bench._vs_prev(per, 6.2, prev, "BENCH_rX.json")
        assert block["calibrator_drift"] == 1.2
        assert block["calibrator_n"] == 1
        assert block["calibrator_degraded"] is True

    def test_no_calibrators_yields_none(self):
        per = {"other_query": 1.0}
        prev = _prev({"other_query": 1.0})
        block = bench._vs_prev(per, 1.0, prev, "BENCH_rX.json")
        assert block["calibrator_drift"] is None
        assert block["calibrator_n"] == 0
        assert block["calibrator_degraded"] is True


class TestComparableAndRegressions:
    def test_comparable_ratio_over_intersection_only(self):
        per = {"q1_pricing_summary": 2.0, "brand_new_query": 100.0}
        prev = _prev({"q1_pricing_summary": 1.0})
        block = bench._vs_prev(per, 102.0, prev, "BENCH_rX.json")
        # the new query must not inflate the comparable ratio
        assert block["comparable_total"] == 2.0
        assert block["comparable_prev"] == 1.0
        assert block["comparable_ratio"] == 2.0

    def test_regression_flag_threshold(self):
        per = {"a": 1.31, "b": 1.29}
        prev = _prev({"a": 1.0, "b": 1.0})
        block = bench._vs_prev(per, 2.6, prev, "BENCH_rX.json")
        assert "a" in block["regressions"] and "b" not in block["regressions"]
        assert block["regressions"]["a"]["ratio"] == 1.31
