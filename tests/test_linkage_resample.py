"""Edge-case + property coverage for the eighth batch: blocked/symspell
edit-distance linkage, gap-fill resampling, deterministic reservoir
sampling, token divergence, and the equi-depth histogram.

The differential oracle checks live in tools/check_oracle.py (all six
pipeline8 queries are oracle-green at sf0.001/0.01/0.1); these tests pin
the semantics the oracles can't see: completeness of deletion-neighborhood
blocking against brute-force truth on adversarial strings, forward-fill
behavior on gap shapes, partitioning-invariance of the hash reservoir, and
the histogram's bucket-balance invariant.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from mapreducefw_spark.operators.linkage import (
    blocked_levenshtein_pairs,
    deletion_neighborhood_pairs,
)
from mapreducefw_spark.operators.resample import gap_fill_ffill
from mapreducefw_spark.queries import QUERIES, load_all

load_all()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


# Adversarial shapes: substitutions at both ends, pure inserts/deletes,
# double substitution, transposition (= 2 for plain Levenshtein), length
# straddlers, and an identical pair (must be EXCLUDED, dist 0).
LINK_ROWS = [
    (1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "sitting"),
    (5, "kitten"), (6, "mitten"), (7, "kit"), (8, "kien"),
    (9, "abcd"), (10, "abdc"), (11, "xyzzy"), (12, "ab"),
]


def test_symspell_matches_bruteforce(spark):
    df = spark.createDataFrame(LINK_ROWS, ["id", "txt"]).repartition(5)
    got = {
        (r.a_id, r.b_id, r.dist)
        for r in deletion_neighborhood_pairs(df, "id", "txt", 2).collect()
    }
    want = {
        (a, b, _lev(ta, tb))
        for a, ta in LINK_ROWS
        for b, tb in LINK_ROWS
        if a < b and 1 <= _lev(ta, tb) <= 2
    }
    assert got == want
    # the identical pair (1,5) is dist 0 and must not appear
    assert all(not (a == 1 and b == 5) for a, b, _ in got)


def test_symspell_null_and_empty_text(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, None), (3, "a"), (4, "")], ["id", "txt"]
    )
    got = {(r.a_id, r.b_id, r.dist)
           for r in deletion_neighborhood_pairs(df, "id", "txt", 2).collect()}
    # NULL row contributes nothing; ""-"a"-"ab" chain is all within dist 2.
    assert got == {(1, 3, 1), (1, 4, 2), (3, 4, 1)}


def test_blocked_form_is_block_restricted(spark):
    # same block -> found; different block -> excluded even at dist 1
    df = spark.createDataFrame(
        [(1, "red gear x"), (2, "ted gear x"), (3, "red bear x")],
        ["id", "txt"],
    )
    pairs = blocked_levenshtein_pairs(
        df, "id", "txt", lambda t: F.split(t, " ").getItem(1), 2
    ).collect()
    assert {(r.a_id, r.b_id, r.dist) for r in pairs} == {(1, 2, 1)}


def _mk_ts(day, hour):
    return dt.datetime(2024, 1, day, hour, 30)


def test_gap_fill_shapes(spark):
    rows = [
        ("a", _mk_ts(1, 0), 1.0),
        ("a", _mk_ts(1, 3), 5.0),   # 2-hour gap at hours 1, 2
        ("b", _mk_ts(1, 5), 7.0),   # single-bucket key: no gaps
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    out = gap_fill_ffill(
        df, "k", "ts", F.sum(F.col("v")).cast("double"), "1 hour", "hour"
    ).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    a = sorted(by_key["a"], key=lambda r: r.bucket)
    assert [r.bucket.hour for r in a] == [0, 1, 2, 3]
    assert [r.is_gap for r in a] == [0, 1, 1, 0]
    assert [r.filled_value for r in a] == [1.0, 1.0, 1.0, 5.0]
    assert [r.value for r in a] == [1.0, None, None, 5.0]
    assert len(by_key["b"]) == 1 and by_key["b"][0].is_gap == 0


def test_reservoir_partitioning_invariant(spark, sf_dir):
    q = QUERIES["reservoir_sample_sources"]
    base = {(r.source, r.doc_id, r.sample_rank) for r in q(spark, sf_dir).collect()}
    # same sample regardless of input partitioning
    from mapreducefw_spark.queries._util import t as load_t

    docs = load_t(spark, sf_dir, "documents").repartition(13)
    from mapreducefw_spark.queries.pipeline8 import RESERVOIR_K, RESERVOIR_SALT
    from pyspark.sql.window import Window as W

    w = W.partitionBy("source").orderBy(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(RESERVOIR_SALT))),
        "doc_id",
    )
    again = {
        (r.source, r.doc_id, r.sample_rank)
        for r in docs.select(
            "source", "doc_id", F.row_number().over(w).alias("sample_rank")
        )
        .filter(F.col("sample_rank") <= RESERVOIR_K)
        .collect()
    }
    assert base == again
    per_group = {}
    for s, _, _ in base:
        per_group[s] = per_group.get(s, 0) + 1
    assert all(v <= RESERVOIR_K for v in per_group.values())


def test_equi_depth_bucket_balance(spark, sf_dir):
    rows = QUERIES["equi_depth_histogram"](spark, sf_dir).collect()
    assert [r.bucket for r in rows] == list(range(8))
    sizes = [r.n_rows for r in rows]
    # equi-depth: bucket sizes differ by at most 1 under the div formula
    assert max(sizes) - min(sizes) <= 1
    # boundaries are monotone: bucket i's max <= bucket i+1's min
    for lo, hi in zip(rows, rows[1:]):
        assert lo.max_price <= hi.min_price


def test_divergence_zero_for_identical_distribution(spark):
    # two sources with the SAME token distribution -> KL == 0 for both
    rows = [(i, "x y z x", "s" + str(i % 2)) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    df.createOrReplaceTempView("_divtest")
    cnt = (
        df.select("source", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = cnt.groupBy("tok").agg(F.sum("n").alias("gn"))
    src = cnt.join(top, "tok")
    tot = src.groupBy("source").agg(F.sum("n").alias("st"))
    gtot = top.agg(F.sum("gn").alias("gt"))
    p = F.col("n") / F.col("st")
    c = F.col("gn") / F.col("gt")
    out = (
        src.join(tot, "source")
        .crossJoin(gtot)
        .groupBy("source")
        .agg(F.round(F.sum(p * F.log(p / c)), 5).alias("kl"))
        .collect()
    )
    assert all(r.kl == 0.0 for r in out)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_texts = st.lists(
    st.one_of(st.none(), st.text(alphabet="abc", max_size=6)),
    min_size=2,
    max_size=14,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=_texts)
def test_symspell_property_random_strings(spark_global, texts):
    """Deletion-neighborhood completeness on RANDOM short strings over a
    3-letter alphabet (high collision density — the adversarial regime for
    variant blocking): result set must equal brute force exactly."""
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark_global.createDataFrame(rows, schema="id long, txt string")
    got = {
        (r.a_id, r.b_id, r.dist)
        for r in deletion_neighborhood_pairs(df, "id", "txt", 2).collect()
    }
    want = {
        (a, b, _lev(ta, tb))
        for a, ta in rows
        for b, tb in rows
        if ta is not None and tb is not None and a < b and 1 <= _lev(ta, tb) <= 2
    }
    assert got == want
