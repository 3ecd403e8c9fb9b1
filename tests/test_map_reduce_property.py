"""Property-based reference-semantics tests: random inputs through the
map_reduce adapter vs the pure-Python simulator (SURVEY §5.2 item 3)."""

from __future__ import annotations

from collections import defaultdict
from collections.abc import Iterator

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreducefw_spark.plans.map_reduce import map_reduce

keys = st.sampled_from(["a", "b", "c", "d", ""])
vals = st.integers(min_value=-100, max_value=100)
rows = st.lists(st.tuples(keys, vals), min_size=0, max_size=40)


def py_mapreduce(items, emit_factor):
    groups = defaultdict(list)
    for k, v in items:
        for _ in range(emit_factor(v)):  # flat map: 0..N emits
            groups[k].append(v)
    out = []
    for k, values in groups.items():
        if values:
            out.append((k, sum(values), len(values)))
    return sorted(out)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows)
def test_adapter_matches_simulator_on_random_inputs(spark_global, rows):
    spark = spark_global
    emit_factor = lambda v: 0 if v < 0 else (2 if v % 7 == 0 else 1)  # noqa: E731
    expected = py_mapreduce(rows, emit_factor)

    df = spark.createDataFrame(rows or [("__sentinel__", 0)], "k string, v int")
    if not rows:
        df = df.filter("k <> '__sentinel__'")

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            reps = pdf["v"].map(emit_factor)
            idx = pdf.index.repeat(reps)
            out = pdf.loc[idx]
            yield pd.DataFrame({"k2": out["k"].to_numpy(), "v2": out["v"].to_numpy()})

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "k3": [pdf["k2"].iloc[0]],
                "total": [int(pdf["v2"].sum())],
                "n": [len(pdf)],
            }
        )

    got = map_reduce(
        df,
        map_fn,
        reduce_fn,
        map_schema="k2 string, v2 int",
        out_schema="k3 string, total bigint, n bigint",
        sort_cols=("k3",),
    ).collect()
    assert [(r.k3, r.total, r.n) for r in got] == expected
