"""Pins for the round-12 community-detection batch (pipeline43).

The DuckDB oracles replay the propagation as unrolled SQL stages; these
pins add a THIRD implementation — a dict-based pure-Python synchronous
LPA written directly from the Raghavan et al. 2007 update rule — run on
the fixture graph and compared EXACTLY, plus analytic structure cases
the fixture can't witness (two disjoint cliques must map to two
distinct communities; a bridge node adopts the larger clique's label;
the all-tied star resolves by min-label).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

from mapreducefw_spark.queries import QUERIES, load_all
from mapreducefw_spark.queries.pipeline43 import LPA_ITERS

load_all()

SF_DIR = "/root/testdata/sf0.001"


def _edges():
    return duckdb.sql(
        "SELECT DISTINCT a.l_partkey, b.l_partkey "
        f"FROM '{SF_DIR}/lineitem.parquet' a "
        f"JOIN '{SF_DIR}/lineitem.parquet' b "
        "ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey"
    ).fetchall()


def _lpa(edges, iters=LPA_ITERS):
    """Synchronous LPA: most-frequent neighbor label, min-label tiebreak."""
    nbrs = defaultdict(list)
    for s, d in edges:
        nbrs[d].append(s)
    labels = {n: n for n in nbrs}
    for _ in range(iters):
        nxt = {}
        for n, ns in nbrs.items():
            cnt = Counter(labels[m] for m in ns)
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            # max count, then SMALLEST label: invert label sign in the key
            nxt[n] = best[0]
        labels = nxt
    return labels


def test_lpa_matches_pure_python(spark):
    got = {
        r["part"]: r["community"]
        for r in QUERIES["label_propagation_communities"](spark, SF_DIR).collect()
    }
    expected = _lpa(_edges())
    assert got == expected


def test_quality_report_matches_pure_python(spark):
    got = {
        r["community"]: r
        for r in QUERIES["community_quality_report"](spark, SF_DIR).collect()
    }
    edges = _edges()
    labels = _lpa(edges)
    n_nodes = Counter(labels.values())
    internal = Counter()
    degree = Counter()
    for s, d in edges:
        degree[labels[s]] += 1
        if labels[s] == labels[d]:
            internal[labels[s]] += 1
    assert set(got) == set(n_nodes)
    for c in n_nodes:
        r = got[c]
        assert (r["n_nodes"], r["internal_edges"], r["total_degree"]) == (
            n_nodes[c],
            internal[c],
            degree[c],
        )
        # structural sanity: internal edges bounded by total degree
        assert r["internal_edges"] <= r["total_degree"]


def test_lpa_separates_disjoint_cliques():
    # two 4-cliques with no bridge: communities = the two min labels
    def clique(ns):
        return [(a, b) for a in ns for b in ns if a != b]

    labels = _lpa(clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]))
    assert {labels[n] for n in (1, 2, 3, 4)} == {1}
    assert {labels[n] for n in (10, 11, 12, 13)} == {10}


def test_lpa_bridge_adopts_larger_clique():
    # node 20 touches a 5-clique and a 3-clique: majority wins
    def clique(ns):
        return [(a, b) for a in ns for b in ns if a != b]

    big, small = [1, 2, 3, 4, 5], [10, 11, 12]
    bridge = [(20, n) for n in big + small] + [(n, 20) for n in big + small]
    labels = _lpa(clique(big) + clique(small) + bridge)
    assert labels[20] == 1  # the big clique's converged label


def test_lpa_tie_resolves_to_min_label():
    # star center with two leaves: 1-vs-1 neighbor labels, min wins
    labels = _lpa([(5, 100), (100, 5), (7, 100), (100, 7)], iters=1)
    assert labels[100] == 5


def test_lpa_iteration_zero_is_identity():
    labels = _lpa([(1, 2), (2, 1)], iters=0)
    assert labels == {1: 1, 2: 2}
