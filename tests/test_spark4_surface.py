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


def test_sql_scripting_control_flow(spark, sf_dir):
    """Spark 4 SQL scripting: DECLARE / SET / WHILE / IF execute as one
    compound statement — procedural control flow without a driver-side
    Python loop. The loop result must equal the closed form."""
    old = spark.conf.get("spark.sql.scripting.enabled", "false")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    try:
        rows = spark.sql(
            """
            BEGIN
              DECLARE i INT DEFAULT 1;
              DECLARE acc BIGINT DEFAULT 0;
              WHILE i <= 100 DO
                SET acc = acc + i;
                SET i = i + 1;
              END WHILE;
              IF acc = 5050 THEN
                SELECT acc AS total, 'closed-form-match' AS verdict;
              ELSE
                SELECT acc AS total, 'mismatch' AS verdict;
              END IF;
            END
            """
        ).collect()
        assert [(r.total, r.verdict) for r in rows] == [(5050, "closed-form-match")]
    finally:
        spark.conf.set("spark.sql.scripting.enabled", old)


def test_managed_table_catalog_roundtrip(spark, sf_dir, tmp_path):
    """Catalog surface: saveAsTable registers a managed table readable by
    name and by SQL, listed in the catalog, appendable via insertInto, and
    dropped cleanly. (Warehouse dir is session-scoped local parquet — the
    catalog API is identical against a metastore.)"""
    from pyspark.sql import functions as F

    name = "t_catalog_rt"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.write.saveAsTable(name)
    try:
        assert name in [t.name for t in spark.catalog.listTables()]
        by_name = spark.table(name)
        assert by_name.count() == nation.count()
        assert spark.sql(f"SELECT COUNT(*) AS n FROM {name}").first().n == nation.count()
        # append via insertInto doubles the rows
        nation.write.insertInto(name)
        assert spark.table(name).count() == 2 * nation.count()
        # predicate pushdown still reaches the managed table's scan
        plan = (
            spark.table(name)
            .filter(F.col("n_nationkey") == 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(n_nationkey), EqualTo(n_nationkey,3)]" in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    assert name not in [t.name for t in spark.catalog.listTables()]
