"""Incremental view maintenance (operators/ivm.py): merge == recompute.

The binding property: folding any well-formed changelog (inserts +1,
retractions -1 of previously-present rows) into an existing aggregate gives
exactly the aggregate a full recompute over the resulting row multiset would
— including groups vanishing when their last row is retracted."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from mapreducefw_spark.operators import ivm


def _full_agg(df):
    return df.groupBy("k").agg(
        F.sum("x").alias("sum_x"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_equals_recompute_random_changelogs(spark):
    rng = random.Random(7)
    base_rows = [(i, rng.choice("abcd"), rng.randint(-50, 50)) for i in range(200)]
    base = spark.createDataFrame(base_rows, "rid int, k string, x long")
    view = _full_agg(base)

    # Changelog: retract 60 random existing rows, insert 80 new ones.
    retract_ids = set(rng.sample(range(200), 60))
    inserts = [(200 + i, rng.choice("abcde"), rng.randint(-50, 50)) for i in range(80)]
    changes = spark.createDataFrame(
        [(r, k, x, -1) for (r, k, x) in base_rows if r in retract_ids]
        + [(r, k, x, 1) for (r, k, x) in inserts],
        "rid int, k string, x long, _w int",
    )
    merged = ivm.merge_agg_delta(view, changes, keys=["k"], sum_cols={"sum_x": "x"})

    survivors = [r for r in base_rows if r[0] not in retract_ids] + inserts
    expect = _full_agg(spark.createDataFrame(survivors, "rid int, k string, x long"))
    assert _rows(merged) == _rows(expect)


def test_group_vanishes_when_fully_retracted(spark):
    base = spark.createDataFrame(
        [(1, "solo", 10), (2, "keep", 5), (3, "keep", 7)], "rid int, k string, x long"
    )
    view = _full_agg(base)
    changes = spark.createDataFrame([(1, "solo", 10, -1)], "rid int, k string, x long, _w int")
    merged = ivm.merge_agg_delta(view, changes, keys=["k"], sum_cols={"sum_x": "x"})
    assert _rows(merged) == [("keep", 12, 2)]


def test_new_group_appears_from_inserts_only(spark):
    base = spark.createDataFrame([(1, "a", 1)], "rid int, k string, x long")
    view = _full_agg(base)
    changes = spark.createDataFrame(
        [(2, "b", 4, 1), (3, "b", 6, 1)], "rid int, k string, x long, _w int"
    )
    merged = ivm.merge_agg_delta(view, changes, keys=["k"], sum_cols={"sum_x": "x"})
    assert _rows(merged) == [("a", 1, 1), ("b", 10, 2)]


def test_chained_merges_equal_one_recompute(spark):
    """Applying N changelogs one at a time == recomputing over the end state:
    the view stays self-consistent across days, not just for one delta."""
    rng = random.Random(21)
    live = {i: (rng.choice("ab"), rng.randint(0, 9)) for i in range(50)}
    base = spark.createDataFrame(
        [(r, k, x) for r, (k, x) in live.items()], "rid int, k string, x long"
    )
    view = _full_agg(base)
    next_id = 50
    for _ in range(3):
        ops = []
        for rid in rng.sample(sorted(live), 10):
            k, x = live.pop(rid)
            ops.append((rid, k, x, -1))
        for _ in range(12):
            live[next_id] = (rng.choice("abc"), rng.randint(0, 9))
            ops.append((next_id, *live[next_id], 1))
            next_id += 1
        changes = spark.createDataFrame(ops, "rid int, k string, x long, _w int")
        view = ivm.merge_agg_delta(view, changes, keys=["k"], sum_cols={"sum_x": "x"})
        # Materialize between days like a real pipeline would (the view is a
        # table on disk, not a growing lineage); also keeps the test honest —
        # each merge consumes the previous OUTPUT, not the previous plan.
        view = spark.createDataFrame(view.collect(), view.schema)
    expect = _full_agg(
        spark.createDataFrame(
            [(r, k, x) for r, (k, x) in live.items()], "rid int, k string, x long"
        )
    )
    assert _rows(view) == _rows(expect)


def test_registered_query_matches_full_recompute(spark, sf_dir):
    from mapreducefw_spark.queries.pipeline7 import incremental_agg_maintenance

    got = incremental_agg_maintenance(spark, sf_dir)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    expect = (
        li.filter((F.col("l_orderkey") % 5 == 0) | (F.col("l_orderkey") % 7 != 3))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in expect.collect()]


def test_streaming_changelog_maintains_parquet_view(spark, sf_dir, tmp_path):
    """Streaming IVM: a weighted changelog stream (all events as inserts,
    every event_id % 3 == 0 also retracted) drives ParquetViewMerger over
    multiple micro-batches; the final epoch's parquet view equals a batch
    recompute over the net row set. Retractions may land in a different
    micro-batch than their inserts — the merge is order-insensitive."""
    from mapreducefw_spark.operators import ivm
    from mapreducefw_spark.queries._util import dec, t

    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    src = str(tmp_path / "changelog_src")
    ev.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches

    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    changes = stream.withColumn("_w", F.lit(1)).unionByName(
        stream.filter(F.col("event_id") % 3 == 0).withColumn("_w", F.lit(-1))
    )
    merger = ivm.ParquetViewMerger(
        str(tmp_path / "view"),
        keys=["event_type"],
        sum_cols={"total_value": dec("value")},
    )
    q = changes.writeStream.foreachBatch(merger).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert merger.current is not None
    got = spark.read.parquet(merger.current).select(
        "event_type", F.col("total_value").cast("double").alias("tv"), "n_rows"
    )
    expect = (
        ev.filter(F.col("event_id") % 3 != 0)
        .groupBy("event_type")
        .agg(
            F.sum(dec("value")).cast("double").alias("tv"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))
