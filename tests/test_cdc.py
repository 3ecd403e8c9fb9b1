"""CDC changelog apply (operators/cdc.py): MERGE-style fold of an I/U/D
changelog into a base snapshot, last-writer-wins on the sequence column."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducefw_spark.operators import cdc


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, "d", 40)],
        "k int, name string, v int",
    )


def _apply(spark, changes_rows, **kw):
    changes = spark.createDataFrame(
        changes_rows, "k int, name string, v int, op string, seq int"
    )
    out = cdc.apply_changelog(_base(spark), changes, key_cols=["k"], **kw)
    return {r["k"]: (r["name"], r["v"]) for r in out.collect()}


def test_update_insert_delete(spark):
    got = _apply(
        spark,
        [
            (2, "b2", 21, "U", 1),  # plain update
            (3, None, 0, "D", 1),  # delete
            (9, "i", 90, "I", 1),  # insert under a new key
        ],
    )
    assert got == {1: ("a", 10), 2: ("b2", 21), 4: ("d", 40), 9: ("i", 90)}


def test_last_writer_wins_delete_then_reinsert(spark):
    got = _apply(
        spark,
        [
            (2, None, 0, "D", 1),
            (2, "back", 22, "I", 2),  # reinsert after delete: later seq wins
            (4, "d4", 44, "U", 1),
            (4, None, 0, "D", 2),  # update then delete: delete wins
        ],
    )
    assert got == {1: ("a", 10), 2: ("back", 22), 3: ("c", 30)}


def test_output_schema_matches_base_exactly(spark):
    changes = spark.createDataFrame(
        [(1, "a1", 11, "U", 1)], "k int, name string, v int, op string, seq int"
    )
    out = cdc.apply_changelog(_base(spark), changes, key_cols=["k"])
    assert out.columns == _base(spark).columns


def test_no_broadcast_path_same_result(spark):
    rows = [(1, "x", 99, "U", 5), (7, "n", 70, "I", 1), (4, None, 0, "D", 1)]
    assert _apply(spark, rows) == _apply(spark, rows, broadcast_changes=False)


def test_base_side_plan_has_no_window_or_sort(spark):
    """The 100 TB contract: the base table must not be windowed or sorted —
    only anti-joined (broadcast). The changelog is consumed twice (anti-join
    keys + upserts), so exactly two Window nodes appear, both over the small
    changelog and both WindowGroupLimit-pruned; the base feeds only the
    LeftAnti's streamed side."""
    base = _base(spark)
    changes = spark.createDataFrame(
        [(1, "a1", 11, "U", 1)], "k int, name string, v int, op string, seq int"
    )
    out = cdc.apply_changelog(base, changes, key_cols=["k"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window [") == 2  # both over the changelog
    assert plan.count("WindowGroupLimit") == 2  # top-1 pruned before shuffle
    assert "LeftAnti" in plan and "strategy=broadcast" in plan
