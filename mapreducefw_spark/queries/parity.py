"""Reference-parity queries (SURVEY §7 M1): the generic map_reduce adapter
driving the reference's own workload shapes, checked against plain SQL.

``mr_search`` mirrors the Search client end-to-end: Map emits (dir, name)
pairs with 0..N emits per input (``SearchMRC.cpp:46-75``), Reduce filters by
substring and re-keys value->key with a NULL payload (``SearchMRC.cpp:78-98``),
output globally sorted ascending (``MRFCore.cpp:418-420``).

``mr_wordcount`` is the canonical MapReduce job on the documents table —
proof the adapter handles N-emit Map and fold-style Reduce.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.plans.map_reduce import map_reduce
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

SEARCH_SUBSTR = "widget"


@register(
    "mr_search",
    oracle=f"""
SELECT p_name AS key, CAST(NULL AS VARCHAR) AS value
FROM part
WHERE p_name LIKE '%{SEARCH_SUBSTR}%'
ORDER BY key
""",
)
def mr_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search workload via the generic MapReduce adapter (slow path by design:
    proves the adapter's semantics; `projection_rekey` is the Catalyst form)."""
    part = t(spark, sf_dir, "part").select(
        F.col("p_brand").alias("k1"), F.col("p_name").alias("v1")
    )

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # identity emit: (k1 -> k2, v1 -> v2)
            yield pd.DataFrame({"k2": pdf["k1"], "v2": pdf["v1"]})

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        # na=False: NULL payloads are legal in the model (Search.cpp:27) and
        # must filter out, not poison the boolean mask
        hits = pdf[pdf["v2"].str.contains(SEARCH_SUBSTR, regex=False, na=False)]
        return pd.DataFrame(
            {"key": hits["v2"].to_numpy(), "value": [None] * len(hits)},
            dtype=object,
        )

    return map_reduce(
        part,
        map_fn,
        reduce_fn,
        map_schema="k2 string, v2 string",
        out_schema="key string, value string",
        key_cols=("k2",),
        sort_cols=("key",),
    )


@register(
    "mr_wordcount",
    oracle="""
SELECT token, COUNT(*) AS n
FROM (SELECT UNNEST(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 200)
WHERE token <> ''
GROUP BY token
ORDER BY token
""",
)
def mr_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200).select("text")

    def map_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # flat map: one row per token (1 -> N emits)
            # dropna first: str.split(NaN) survives the != '' filter and
            # would emit a null-key group, while the oracle's
            # UNNEST(string_split(NULL)) emits zero rows
            tokens = pdf["text"].dropna().str.split(" ").explode()
            tokens = tokens[tokens != ""]
            yield pd.DataFrame({"k2": tokens, "v2": 1})

    def reduce_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"token": [pdf["k2"].iloc[0]], "n": [int(pdf["v2"].sum())]})

    return map_reduce(
        docs,
        map_fn,
        reduce_fn,
        map_schema="k2 string, v2 int",
        out_schema="token string, n bigint",
        key_cols=("k2",),
        sort_cols=("token",),
    )
