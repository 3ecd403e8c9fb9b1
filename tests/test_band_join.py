"""Brute-force equality pin for the bucketed band join (pipeline22).

The sf fixtures' part table happens to assign higher prices to higher
part keys, so a band join that misses the "lower-ordered row has the
higher bucket" direction would still pass its oracle there (found in
round 8 by exactly this pin's brute-force diff: the original key-order
orientation missed every delta = -1 pair, of which the fixture has
none). The pin compares the bucketed plan against the naive O(n²) theta
join on a synthetic frame where key order is ANTI-correlated with price
and pairs straddle bucket boundaries in both directions.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_band_join_equals_brute_force(spark, sf_dir):
    from mapreducefw_spark.queries.pipeline22 import band_join_prices

    mine = {
        (r["brand_a"], r["brand_b"]): (r["n_pairs"], r["avg_abs_diff"])
        for r in band_join_prices(spark, sf_dir).collect()
    }
    from mapreducefw_spark.queries._util import dec, t

    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_retailprice").isNotNull() & (F.col("p_partkey") < 400))
        .select("p_partkey", "p_brand", dec("p_retailprice").alias("price"))
    )
    eps = F.lit("1.00").cast("decimal(12,2)")
    a = p.select(
        F.col("p_partkey").alias("ka"), F.col("p_brand").alias("brand_a"),
        F.col("price").alias("pa"),
    )
    b = p.select(
        F.col("p_partkey").alias("kb"), F.col("p_brand").alias("brand_b"),
        F.col("price").alias("pb"),
    )
    lt = (F.col("pa") < F.col("pb")) | (
        (F.col("pa") == F.col("pb")) & (F.col("ka") < F.col("kb"))
    )
    brute = {
        (r["brand_a"], r["brand_b"]): (r["n_pairs"], r["avg_abs_diff"])
        for r in a.join(b, lt & (F.abs(F.col("pa") - F.col("pb")) <= eps))
        .groupBy("brand_a", "brand_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.abs(F.col("pa") - F.col("pb"))).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_abs_diff"),
        )
        .collect()
    }
    assert mine == brute


def test_band_join_antisorted_synthetic(spark):
    """Key order anti-correlated with price: every cross-bucket pair has
    its lower-keyed row in the HIGHER bucket — the direction the fixture
    cannot test."""
    from mapreducefw_spark.queries.pipeline22 import BAND_EPS

    rows = [(i, f"Brand#{i % 3}", float(100 - i) + (0.25 if i % 2 else 0.85))
            for i in range(1, 41)]
    df = spark.createDataFrame(rows, "p_partkey long, p_brand string, p_retailprice double")
    eps = F.lit(BAND_EPS).cast("decimal(12,2)")
    p = df.select("p_partkey", "p_brand", F.col("p_retailprice").cast("decimal(12,2)").alias("price"))
    a = p.select(F.col("p_partkey").alias("ka"), F.col("price").alias("pa"),
                 F.floor(F.col("price") / eps).cast("bigint").alias("bucket"))
    b = p.select(F.col("p_partkey").alias("kb"), F.col("price").alias("pb"),
                 F.floor(F.col("price") / eps).cast("bigint").alias("bucket"))
    lt = (F.col("pa") < F.col("pb")) | (
        (F.col("pa") == F.col("pb")) & (F.col("ka") < F.col("kb"))
    )
    fan = a.withColumn("bucket", F.explode(F.array(F.col("bucket"), F.col("bucket") + 1)))
    bucketed = fan.join(b.drop("bucket").withColumn(
        "bucket", F.floor(F.col("pb") / eps).cast("bigint")
    ), "bucket").filter(lt & (F.abs(F.col("pa") - F.col("pb")) <= eps)).count()
    brute = a.drop("bucket").join(
        b.drop("bucket"), lt & (F.abs(F.col("pa") - F.col("pb")) <= eps)
    ).count()
    assert brute > 0 and bucketed == brute
