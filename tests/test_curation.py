"""Property pins for the curation operators (operators/curation.py):
water-filling vs a pure-Python iterative reference, bloom no-false-negative
guarantee, stratified-sample exactness and partitioning-invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.operators import curation
from mapreducefw_spark.queries import QUERIES, load_all

load_all()


def _iterative_waterfill(avail: dict[str, int], budget: float) -> dict[str, float]:
    """Textbook water-filling: raise the level until the budget is spent.
    Returns UNfloored allocations (the operator floors unsaturated ones)."""
    remaining = dict(avail)
    alloc = {s: 0.0 for s in avail}
    b = budget
    active = set(avail)
    while active and b > 1e-9:
        level = b / len(active)
        sat = {s for s in active if remaining[s] <= level}
        if not sat:
            for s in active:
                alloc[s] = level
            b = 0.0
            break
        for s in sat:
            alloc[s] = remaining[s]
            b -= remaining[s]
            active.remove(s)
    return alloc


@pytest.mark.parametrize("frac", [0.0, 0.2, 0.6, 0.95, 1.5])
def test_waterfill_matches_iterative_reference(spark, frac):
    avail = {"a": 100, "b": 250, "c": 250, "d": 900, "e": 3000}
    budget = frac * sum(avail.values())
    per = spark.createDataFrame(
        [(s, n) for s, n in avail.items()], "source string, n_tokens long"
    )
    got = {
        r["source"]: r["alloc_tokens"]
        for r in curation.token_budget_waterfill(per, budget).collect()
    }
    want = _iterative_waterfill(avail, budget)
    for s in avail:
        # operator floors unsaturated allocations; saturated ones are exact
        assert got[s] in (int(want[s]), math.floor(want[s])), (s, got[s], want[s])
        assert got[s] <= avail[s]
    assert sum(got.values()) <= min(budget, sum(avail.values())) + 1e-6
    # flooring loses < 1 token per source
    assert sum(got.values()) >= min(budget, sum(avail.values())) - len(avail)


def test_waterfill_all_saturate_when_budget_exceeds_total(spark):
    per = spark.createDataFrame(
        [("a", 10), ("b", 20)], "source string, n_tokens long"
    )
    got = {
        r["source"]: r["alloc_tokens"]
        for r in curation.token_budget_waterfill(per, 1000).collect()
    }
    assert got == {"a": 10, "b": 20}


def test_bloom_has_no_false_negatives(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    contam = (
        docs.filter((F.col("doc_id") % 7 == 0) & F.col("text").isNotNull())
        .select("text")
        .distinct()
    )
    bitmap = curation.bloom_bitmap(contam)
    probed = curation.bloom_probe(docs, bitmap)
    missed = (
        probed.join(F.broadcast(contam), "text", "left_semi")
        .filter(~F.col("bloom_hit"))
        .count()
    )
    assert missed == 0
    # FP rate at this load factor (n*k/m ~ 3e-4) is ~(1-e^{-kn/m})^4 < 1e-13:
    # bloom hits must equal exact hits exactly here
    n_bloom = probed.filter("bloom_hit").count()
    n_exact = probed.join(F.broadcast(contam), "text", "left_semi").count()
    assert n_bloom == n_exact


def test_stratified_sample_exact_k_and_partitioning_invariant(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    k = 5
    base = curation.stratified_sample(docs, "source", k)
    sizes = {r["source"]: r["n"] for r in base.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    group_sizes = {r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    for s, n in sizes.items():
        assert n == min(k, group_sizes[s]), (s, n)
    # identical selection regardless of input partitioning
    ids_a = sorted(r["doc_id"] for r in base.select("doc_id").collect())
    ids_b = sorted(
        r["doc_id"]
        for r in curation.stratified_sample(docs.repartition(13), "source", k)
        .select("doc_id")
        .collect()
    )
    assert ids_a == ids_b


def test_quality_deciles_are_ordered_and_balanced(spark, sf_dir):
    rows = QUERIES["quality_decile_mixture"](spark, sf_dir).collect()
    assert [r["bin"] for r in rows] == list(range(1, 11))
    total = sum(r["n_docs"] for r in rows)
    for r in rows:
        # equal-width bins: each holds floor or ceil of total/10
        assert r["n_docs"] in (total // 10, total // 10 + 1)
    # descending score order: bin b's min >= bin b+1's max
    for hi, lo in zip(rows, rows[1:]):
        assert hi["min_tokens"] >= lo["max_tokens"]


def test_bloom_empty_contamination_set_flags_nothing(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    empty = docs.filter(F.lit(False)).select("text")
    probed = curation.bloom_probe(docs, curation.bloom_bitmap(empty))
    assert probed.filter("bloom_hit").count() == 0
    assert probed.count() == docs.count()  # nothing dropped, only flagged


def test_waterfill_empty_input_returns_empty(spark):
    per = spark.createDataFrame([], "source string, n_tokens long")
    assert curation.token_budget_waterfill(per, 100).count() == 0


def test_count_min_never_underestimates(spark, sf_dir):
    rows = QUERIES["count_min_heavy_hitters"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # CMS error is one-sided: cells only ever ADD counts
        assert r["cms_est"] >= r["exact_cnt"], r
        assert r["overcount"] == r["cms_est"] - r["exact_cnt"]


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_avail = st.dictionaries(
    st.text(alphabet="abcdefgh", min_size=1, max_size=3),
    st.integers(min_value=1, max_value=100_000),
    min_size=1,
    max_size=8,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(avail=_avail, frac=st.floats(min_value=0.0, max_value=2.0, allow_nan=False))
def test_waterfill_property_vs_iterative(spark_global, avail, frac):
    """Random source sizes and budget fractions: the closed-form window
    allocation must track the iterative reference within flooring."""
    budget = frac * sum(avail.values())
    per = spark_global.createDataFrame(
        [(s, n) for s, n in avail.items()], "source string, n_tokens long"
    )
    got = {
        r["source"]: r["alloc_tokens"]
        for r in curation.token_budget_waterfill(per, budget).collect()
    }
    want = _iterative_waterfill(avail, budget)
    for s, n in avail.items():
        assert 0 <= got[s] <= n
        # saturated sources are exact; unsaturated floored from the level
        assert abs(got[s] - want[s]) < 1, (s, got[s], want[s], avail, frac)
    total = sum(got.values())
    assert total <= min(budget, sum(avail.values())) + 1e-6
    assert total >= min(budget, sum(avail.values())) - len(avail)


def test_weighted_sample_es_proportional_to_weight(spark):
    """Efraimidis-Spirakis law: with k=1, item i wins with probability
    w_i / sum(w). Run the deterministic sampler across many salts (each an
    independent draw) on a 4-item group with weights 1/2/3/4 and check the
    empirical win rates against the law."""
    from mapreducefw_spark.operators.curation import weighted_sample_es

    # 400 independent draw-groups in ONE job: each group holds 4 items with
    # weights 1..4 (sum 10) under distinct ids, so every group is an
    # independent draw of the same distribution.
    n_draws = 400
    rows = [
        (d * 10 + i, f"d{d}", float(i + 1)) for d in range(n_draws) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "id int, grp string, w double")
    got = weighted_sample_es(df, "grp", "w", 1, id_col="id").collect()
    assert len(got) == n_draws
    wins = {i: 0 for i in range(4)}
    for r in got:
        wins[r.id % 10] += 1
    for i in range(4):
        expected = (i + 1) / 10.0
        assert abs(wins[i] / n_draws - expected) < 0.07, (i, wins)


def test_weighted_sample_es_exact_k_without_replacement(spark):
    from mapreducefw_spark.operators.curation import weighted_sample_es

    rows = [(i, f"g{i % 3}", float(1 + i % 5)) for i in range(60)]
    df = spark.createDataFrame(rows, "id int, grp string, w double")
    got = weighted_sample_es(df, "grp", "w", 7, id_col="id").collect()
    per = {}
    for r in got:
        per.setdefault(r.grp, []).append(r.id)
    assert set(per) == {"g0", "g1", "g2"}
    for ids in per.values():
        assert len(ids) == 7 and len(set(ids)) == 7  # exact k, no repeats
