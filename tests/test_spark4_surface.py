"""Modern Spark 4 API surface: VARIANT, Python DataSource, observe()
metrics, and Arrow-batch mapInArrow — wiring and semantics pins beyond the
oracle rows (events_props_variant / python_datasource_squares are
hash-checked in the differential harness).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import Observation
from pyspark.sql import functions as F

from mapreducefw_spark.queries import QUERIES, load_all

load_all()


def test_variant_null_safety(spark):
    df = spark.createDataFrame(
        [("a", '{"k": 3}'), ("b", "not json"), ("c", '{"other": 1}'), ("d", None)],
        ["id", "props"],
    )
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint")
    got = {r.id: r.k for r in df.select("id", k.alias("k")).collect()}
    assert got == {"a": 3, "b": None, "c": None, "d": None}


def test_python_datasource_partitioned_read(spark):
    from mapreducefw_spark.sources import python_datasource

    python_datasource.register(spark)
    df = (
        spark.read.format("squares")
        .option("n", "100")
        .option("partitions", "4")
        .load()
    )
    # the source parallelizes: 4 InputPartitions -> 4 scan partitions
    assert df.rdd.getNumPartitions() == 4
    rows = {r.id: r.square for r in df.collect()}
    assert rows == {i: i * i for i in range(100)}


def test_observe_metrics_ride_the_scan(spark, sf_dir):
    # data-quality counters for free on an existing query's single pass —
    # no second scan, no collect of the data itself
    obs = Observation("li_metrics")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    out = (
        li.observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias(
                "null_qty"
            ),
        )
        .groupBy("l_returnflag")
        .count()
    )
    counted = sum(r["count"] for r in out.collect())
    assert obs.get["rows_seen"] == counted == li.count()
    assert obs.get["null_qty"] == 0


def test_map_in_arrow_matches_expression(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/part.parquet").select(
        "p_partkey", "p_retailprice"
    )

    def double_price(batches):
        for b in batches:
            yield b.set_column(
                b.schema.get_field_index("p_retailprice"),
                "p_retailprice",
                pa.compute.multiply(b["p_retailprice"], pa.scalar(2.0)),
            )

    arrow = {
        r.p_partkey: r.p_retailprice
        for r in df.mapInArrow(double_price, df.schema).collect()
    }
    expr = {
        r.p_partkey: r.doubled
        for r in df.select(
            "p_partkey", (F.col("p_retailprice") * 2.0).alias("doubled")
        ).collect()
    }
    assert arrow == expr


def test_python_datasource_streaming_reader(spark, tmp_path):
    from mapreducefw_spark.sources import python_datasource

    python_datasource.register(spark)
    stream = (
        spark.readStream.format("squares")
        .option("n", "50")
        .option("batch", "20")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_sq_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # processAllAvailable drains until the cursor stops advancing at n
        # (Python micro-batch sources don't support Trigger.AvailableNow)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r.id: r.square for r in spark.sql("SELECT * FROM t_sq_stream").collect()}
    # micro-batches of 20 cover [0, 50) exactly once under the offset log
    assert rows == {i: i * i for i in range(50)}
