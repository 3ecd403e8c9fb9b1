"""Property pins for the deterministic-statistics batch (pipeline10)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreducefw_spark.queries import QUERIES, load_all

load_all()


def test_ols_matches_numpy_fit(spark, sf_dir):
    import numpy as np

    rows = QUERIES["ols_price_size_by_brand"](spark, sf_dir).collect()
    assert rows
    part = spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    by_brand = {}
    for p in part:
        by_brand.setdefault(p.p_brand, []).append((p.p_size, p.p_retailprice))
    for r in rows:
        xs, ys = zip(*by_brand[r.p_brand])
        slope, intercept = np.polyfit(np.array(xs, float), np.array(ys, float), 1)
        assert math.isclose(r.slope, slope, rel_tol=1e-9, abs_tol=1e-9)
        assert math.isclose(r.intercept, intercept, rel_tol=1e-9, abs_tol=1e-9)


def test_mad_flags_planted_outlier(spark, tmp_path):
    # 99 values in [10, 11] plus one at 1000: MAD is tiny, the plant must be
    # the single flagged outlier; mean/std would have been dragged ~10x
    rows = [(i, 7, "click", 10.0 + (i % 10) / 10.0, "{}") for i in range(99)]
    rows.append((99, 7, "click", 1000.0, "{}"))
    df = spark.createDataFrame(
        rows, ["event_id", "user_id", "event_type", "value", "props"]
    ).select(
        "event_id",
        F.timestamp_seconds(F.lit(1704067200) + F.col("event_id")).cast(
            "timestamp_ntz"
        ).alias("ts"),
        "user_id", "event_type", "value", "props",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    out = QUERIES["robust_outliers_mad"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 100 and r.n_outliers == 1
    assert 10.0 <= r.median <= 11.0 and r.mad <= 0.5
