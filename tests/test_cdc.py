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


def _simulate(base_rows, changes_rows):
    """Pure-Python reference: last-writer-wins on seq per key, deletes drop,
    I/U upsert; untouched base rows pass through."""
    latest = {}
    for k, name, v, op, seq in changes_rows:
        if k not in latest or seq > latest[k][3]:
            latest[k] = (name, v, op, seq)
    out = {k: (name, v) for k, (name, v) in base_rows.items() if k not in latest}
    for k, (name, v, op, _seq) in latest.items():
        if op != "D":
            out[k] = (name, v)
    return out


def test_apply_changelog_matches_simulator_on_random_logs(spark_global):
    """Property check vs a pure-Python simulator across randomized
    changelogs: every (key-overlap x op-mix x seq-order) combination the
    generator produces must fold identically. Deterministic seeds — no
    flaky sampling."""
    import random

    base_rows = {k: (f"n{k}", k * 10) for k in range(1, 21)}
    base = spark_global.createDataFrame(
        [(k, n, v) for k, (n, v) in base_rows.items()], "k int, name string, v int"
    )
    for seed in range(8):
        rng = random.Random(seed)
        rows, used = [], set()
        for _ in range(rng.randint(1, 40)):
            k = rng.randint(1, 30)  # half the keyspace misses the base
            seq = rng.randint(1, 10)
            if (k, seq) in used:  # contract: (key, seq) unique
                continue
            used.add((k, seq))
            op = rng.choice(["I", "U", "D"])
            rows.append((k, f"c{k}s{seq}", k * 100 + seq, op, seq))
        changes = spark_global.createDataFrame(
            rows, "k int, name string, v int, op string, seq int"
        )
        got = {
            r["k"]: (r["name"], r["v"])
            for r in cdc.apply_changelog(base, changes, key_cols=["k"]).collect()
        }
        expected = _simulate(base_rows, rows)
        assert got == expected, f"seed={seed}"
