"""Pins for the round-12 epoch-shuffle batch (pipeline45).

Beyond the DuckDB oracle, a pure-Python replay (hashlib md5 sort) checks
the full assignment EXACTLY, and structural properties pin what a
training-data server actually relies on: every epoch is a permutation of
the corpus, shard sizes are balanced to +-1, the permutations DIFFER
across epochs (the point of re-shuffling), and the assignment is a pure
function of (epoch, doc_id) — retry/rerun stability.
"""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.queries.pipeline45 import N_EPOCHS, N_SHARDS

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _doc_ids():
    return [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF_DIR}/documents.parquet' "
            "WHERE doc_id IS NOT NULL"
        ).fetchall()
    ]


def _py_assignment():
    ids = _doc_ids()
    out = {}
    for e in range(N_EPOCHS):
        order = sorted(
            ids, key=lambda d: (hashlib.md5(f"epoch{e}:{d}".encode()).hexdigest(), d)
        )
        for pos, d in enumerate(order, start=1):
            out[(e, d)] = (pos, (pos - 1) % N_SHARDS)
    return out


def test_epoch_shuffle_matches_pure_python(spark):
    got = {
        (r["epoch"], r["doc_id"]): (r["position"], r["shard"])
        for r in QUERIES["epoch_shuffle_assignment"](spark, SF_DIR).collect()
    }
    assert got == _py_assignment()


def test_epoch_shuffle_structure(spark):
    rows = QUERIES["epoch_shuffle_assignment"](spark, SF_DIR).collect()
    ids = set(_doc_ids())
    n = len(ids)
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r["epoch"], []).append(r)
    assert set(by_epoch) == set(range(N_EPOCHS))
    orders = {}
    for e, ers in by_epoch.items():
        # a permutation: every doc exactly once, positions 1..n
        assert {r["doc_id"] for r in ers} == ids
        assert sorted(r["position"] for r in ers) == list(range(1, n + 1))
        # round-robin deal -> shard sizes balanced to +-1
        sizes = Counter(r["shard"] for r in ers)
        assert set(sizes) == set(range(min(N_SHARDS, n)))
        assert max(sizes.values()) - min(sizes.values()) <= 1
        orders[e] = [
            r["doc_id"] for r in sorted(ers, key=lambda r: r["position"])
        ]
    # epochs genuinely re-shuffle: no two epoch permutations coincide
    for a in range(N_EPOCHS):
        for b in range(a + 1, N_EPOCHS):
            assert orders[a] != orders[b]


def test_epoch_shuffle_is_rerun_stable(spark):
    a = sorted(
        map(tuple, QUERIES["epoch_shuffle_assignment"](spark, SF_DIR).collect())
    )
    b = sorted(
        map(tuple, QUERIES["epoch_shuffle_assignment"](spark, SF_DIR).collect())
    )
    assert a == b
