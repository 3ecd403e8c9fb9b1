"""Pushdown audit for checkpoint-truncated scans (r13 verdict order,
closed in r14).

The PQ/IVF queries pin their normalized embedding corpus with
``pin``/``localCheckpoint`` (one materialization feeding >= 2 downstream
passes), which truncates the FINAL plan string at an ExistingRDD — so
``tests/test_plan_invariants.py``'s PUSHDOWN_REQUIRED pin cannot see the
embeddings scan and those queries sit on a documented exclusion. That
exclusion made scan-pruning regressions on the embeddings scan
CI-INVISIBLE for them. This test restores the pin by auditing the
PRE-checkpoint frame: it intercepts ``pin`` in each query module,
captures the DataFrame each query is about to materialize, and asserts
the parquet pushdown (the vec_id/embedding NULL guards) still reaches
the embeddings scan inside that subplan.
"""

from __future__ import annotations

import pytest

from mapreducefw_spark.queries import QUERIES, load_all
from tools.plan_audit import audit

load_all()

# query -> (module holding its `pin` reference, substring every captured
# scan-bearing subplan's pushdown must include)
PINNED_PUSHDOWN = {
    "embedding_pq_topk_portable": ("mapreducefw_spark.queries.pipeline33", "vec_id"),
    "embedding_ivf_pq_topk_portable": ("mapreducefw_spark.queries.pipeline33", "vec_id"),
    "pq_recall_report": ("mapreducefw_spark.queries.pipeline39", "vec_id"),
    # the rows-only float twins carry llm_scale's two pins
    "embedding_pq_topk": ("mapreducefw_spark.queries.llm_scale", "vec_id"),
    "embedding_ivf_pq_topk": ("mapreducefw_spark.queries.llm_scale", "vec_id"),
}


@pytest.mark.parametrize("name", sorted(PINNED_PUSHDOWN))
def test_pinned_subplan_pushdown(spark, sf_dir, name, monkeypatch):
    import importlib

    mod_name, needle = PINNED_PUSHDOWN[name]
    mod = importlib.import_module(mod_name)
    assert hasattr(mod, "pin"), f"{mod_name} no longer imports pin"

    captured = []
    from mapreducefw_spark.operators.persist import pin as real_pin

    def capture(df, **kw):
        captured.append(df._jdf.queryExecution().executedPlan().toString())
        return real_pin(df, **kw)

    monkeypatch.setattr(mod, "pin", capture)
    QUERIES[name](spark, sf_dir)  # build only — pin runs during construction

    assert captured, f"{name}: query no longer pins a frame via {mod_name}.pin"
    pushed = [p for plan in captured for p in audit(plan)["pushed_filters"]]
    assert any(needle in p for p in pushed), (
        f"{name}: no pushed parquet filter containing {needle!r} inside the "
        f"pre-checkpoint subplan — scan pruning regressed invisibly\n"
        + "\n---\n".join(captured)
    )
