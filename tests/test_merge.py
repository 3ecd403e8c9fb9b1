"""ANSI MERGE semantics pins for operators/merge.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.operators.merge import (
    merge_into,
    when_matched_delete,
    when_matched_update,
    when_not_matched_by_source_delete,
    when_not_matched_by_source_update,
    when_not_matched_insert,
)


@pytest.fixture(scope="module")
def tgt(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k bigint, name string, v double",
    )


@pytest.fixture(scope="module")
def src(spark):
    # k=1 update, k=2 delete, k=3 matched-but-no-clause, k=9 insert
    return spark.createDataFrame(
        [(1, "U", 11.0), (2, "D", None), (3, "X", 99.0), (9, "I", 90.0)],
        "k bigint, op string, nv double",
    )


def _merged(tgt, src):
    return merge_into(
        tgt,
        src,
        ["k"],
        matched=[
            when_matched_delete(F.col("s.op") == "D"),
            when_matched_update({"v": F.col("s.nv")}, F.col("s.op") == "U"),
        ],
        not_matched=[
            when_not_matched_insert(
                {"k": F.col("s.k"), "v": F.col("s.nv")}, F.col("s.op") == "I"
            )
        ],
        not_matched_by_source=[
            when_not_matched_by_source_update(
                {"name": F.lit("stale")}, F.col("t.k") == 4
            )
        ],
    )


def test_all_three_clause_families(tgt, src):
    got = {r.k: (r.name, r.v) for r in _merged(tgt, src).collect()}
    assert got == {
        1: ("a", 11.0),  # matched update
        # 2 deleted
        3: ("c", 30.0),  # matched, no clause satisfied -> unchanged
        4: ("stale", 40.0),  # not matched by source -> update
        9: (None, 90.0),  # insert; unassigned column -> NULL
    }


def test_first_true_clause_wins(spark, tgt):
    """A later unconditional UPDATE must not restyle rows an earlier
    conditional clause already took (the bug class the dispatch guards)."""
    src = spark.createDataFrame([(1, 111.0), (2, 222.0)], "k bigint, nv double")
    got = {
        r.k: (r.name, r.v)
        for r in merge_into(
            tgt,
            src,
            ["k"],
            matched=[
                when_matched_update({"v": F.col("s.nv")}, F.col("t.k") == 1),
                when_matched_update({"name": F.lit("fallback")}),
            ],
        ).collect()
    }
    assert got[1] == ("a", 111.0)  # first clause fired; second must NOT
    assert got[2] == ("fallback", 20.0)  # second clause catches the rest
    assert got[3] == ("c", 30.0) and got[4] == ("d", 40.0)


def test_not_matched_by_source_delete(tgt, spark):
    src = spark.createDataFrame([(1, 0.0)], "k bigint, nv double")
    got = {
        r.k
        for r in merge_into(
            tgt,
            src,
            ["k"],
            not_matched_by_source=[
                when_not_matched_by_source_delete(F.col("t.v") >= 30.0)
            ],
        ).collect()
    }
    assert got == {1, 2}  # 3 and 4 deleted; 1 matched (kept), 2 untouched


def test_no_clauses_is_identity(tgt, src):
    got = sorted(
        (r.k, r.name, r.v) for r in merge_into(tgt, src, ["k"]).collect()
    )
    assert got == [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)]


def test_cardinality_violation_raises_at_action(spark, tgt):
    dup = spark.createDataFrame([(1, 1.0), (1, 2.0)], "k bigint, nv double")
    merged = merge_into(
        tgt, dup, ["k"], matched=[when_matched_update({"v": F.col("s.nv")})]
    )  # construction must stay lazy — no error yet
    with pytest.raises(Exception) as ei:
        merged.collect()
    assert "21000" in str(ei.value)
    # and the same plan with the guard off picks nondeterministically but runs
    relaxed = merge_into(
        tgt,
        dup,
        ["k"],
        matched=[when_matched_update({"v": F.col("s.nv")})],
        enforce_cardinality=False,
    )
    assert relaxed.filter(F.col("k") == 1).count() == 2  # both joined rows


def test_clause_action_validation(tgt, src):
    with pytest.raises(ValueError, match="WHEN MATCHED supports"):
        merge_into(tgt, src, ["k"], matched=[when_not_matched_insert({})])
    with pytest.raises(ValueError, match="WHEN NOT MATCHED supports"):
        merge_into(tgt, src, ["k"], not_matched=[when_matched_delete()])
    with pytest.raises(ValueError, match="BY SOURCE supports"):
        merge_into(tgt, src, ["k"], not_matched_by_source=[when_not_matched_insert({})])


def test_null_condition_counts_as_not_satisfied(spark, tgt):
    """ANSI three-valued logic: a NULL clause condition means the clause
    does not fire AND does not poison later clauses' dispatch."""
    src = spark.createDataFrame([(1, None), (2, 5.0)], "k bigint, nv double")
    got = {
        r.k: r.v
        for r in merge_into(
            tgt,
            src,
            ["k"],
            matched=[
                when_matched_update({"v": F.col("s.nv")}, F.col("s.nv") > 0),
                when_matched_update({"v": F.lit(-1.0)}),
            ],
        ).collect()
    }
    assert got[1] == -1.0  # NULL condition -> first clause skipped, second fires
    assert got[2] == 5.0


def test_null_merge_keys_never_match(spark):
    """ANSI equality: NULL keys match nothing — a NULL-key target row is
    NOT MATCHED BY SOURCE, a NULL-key source row is NOT MATCHED (and both
    must be classified by presence, not by key nullability)."""
    tgt = spark.createDataFrame(
        [(None, "nullk", 1.0), (1, "a", 10.0)], "k bigint, name string, v double"
    )
    src = spark.createDataFrame([(None, 5.0), (1, 11.0)], "k bigint, nv double")
    got = sorted(
        (
            (r.k, r.name, r.v)
            for r in merge_into(
                tgt,
                src,
                ["k"],
                matched=[when_matched_update({"v": F.col("s.nv")})],
                not_matched=[
                    when_not_matched_insert({"k": F.col("s.k"), "v": F.col("s.nv")})
                ],
                not_matched_by_source=[
                    when_not_matched_by_source_update({"name": F.lit("stale")})
                ],
            ).collect()
        ),
        key=lambda x: (x[0] is not None, x[0] or 0, x[1] or ""),
    )
    assert got == [
        (None, None, 5.0),   # NULL-key source row -> INSERT (not matched)
        (None, "stale", 1.0),  # NULL-key target row -> by-source update
        (1, "a", 11.0),      # normal matched update
    ]


# ---------------- randomized differential vs a pure-Python MERGE ----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_keys = st.integers(min_value=0, max_value=12)
_vals = st.integers(min_value=-5, max_value=5).map(float)
_tgt_rows = st.lists(
    st.tuples(_keys, st.sampled_from("abc"), _vals), max_size=14
).map(lambda rs: list({r[0]: r for r in rs}.values()))  # unique keys
_src_rows = st.lists(
    st.tuples(_keys, st.sampled_from("UDIX"), _vals), max_size=14
).map(lambda rs: list({r[0]: r for r in rs}.values()))


def _py_merge(tgt_rows, src_rows):
    """Pure-Python replay of the exact clause set used below."""
    src = {k: (op, nv) for k, op, nv in src_rows}
    out = []
    for k, name, v in tgt_rows:
        if k in src:
            op, nv = src[k]
            if op == "D":
                continue  # M1 delete
            if op == "U" and v < 3.0:
                out.append((k, "upd", nv))  # M2 conditional update
            else:
                out.append((k, name, -9.0))  # M3 catch-all update
        else:
            if v >= 4.0:
                continue  # NMBS delete
            out.append((k, "stale", v))  # NMBS catch-all update
    tgt_keys = {k for k, _, _ in tgt_rows}
    for k, (op, nv) in src.items():
        if k not in tgt_keys and op == "I":
            out.append((k, None, nv))  # insert, unassigned name -> NULL
    return sorted(out, key=lambda x: (x[0], x[1] or "", x[2]))


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(tgt_rows=_tgt_rows, src_rows=_src_rows)
def test_merge_matches_pure_python_reference(spark, tgt_rows, src_rows):
    tgt = spark.createDataFrame(tgt_rows, "k bigint, name string, v double") \
        if tgt_rows else spark.createDataFrame([], "k bigint, name string, v double")
    src = spark.createDataFrame(src_rows, "k bigint, op string, nv double") \
        if src_rows else spark.createDataFrame([], "k bigint, op string, nv double")
    merged = merge_into(
        tgt,
        src,
        ["k"],
        matched=[
            when_matched_delete(F.col("s.op") == "D"),
            when_matched_update(
                {"v": F.col("s.nv"), "name": F.lit("upd")},
                (F.col("s.op") == "U") & (F.col("t.v") < 3.0),
            ),
            when_matched_update({"v": F.lit(-9.0)}),
        ],
        not_matched=[
            when_not_matched_insert(
                {"k": F.col("s.k"), "v": F.col("s.nv")}, F.col("s.op") == "I"
            )
        ],
        not_matched_by_source=[
            when_not_matched_by_source_delete(F.col("t.v") >= 4.0),
            when_not_matched_by_source_update({"name": F.lit("stale")}),
        ],
    )
    got = sorted(
        ((r.k, r.name, r.v) for r in merged.collect()),
        key=lambda x: (x[0], x[1] or "", x[2]),
    )
    assert got == _py_merge(tgt_rows, src_rows)
