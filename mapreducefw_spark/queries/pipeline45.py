"""Round-12 registrations, batch 6: deterministic epoch shuffling for
training-data serving.

``epoch_shuffle_assignment`` — the "global shuffle per epoch" every large
training run needs: for each epoch, documents are re-ordered by a seeded
hash (md5 of ``epoch<e>:<doc_id>``) and dealt round-robin into shards.
Hash ordering, not ``rand()``: a seeded-hash permutation is RETRY-STABLE
(a recomputed partition reproduces the same order — Spark's ``rand(seed)``
is only stable per partition LAYOUT, which AQE/retries change), it is
resumable mid-epoch, and it makes the assignment a pure function of
(epoch, doc_id) — which is also what lets a DuckDB oracle replay it
exactly. Each document gets (epoch, position-in-epoch, shard); shard
sizes are balanced to ±1 by construction.

Scale posture (100 TB): the E-epoch frame is a crossJoin with a tiny
epoch literal frame (map-only row replication, no shuffle); positions
come from ONE range shuffle over the (epoch, hash) total order via the
two-phase ``global_rank_running`` (no per-epoch window funnel — a
``Window.partitionBy(epoch)`` would pull each epoch through a single
task); the per-epoch offset subtracts e x N with the 1-row doc count
broadcast. Shard deal is a modulo projection.

Semantic contract with the reference engine: the global sort-by-k3 phase
(`/root/reference/MRFCore.cpp:252-446`) keyed by (epoch, hash) — the
shuffle IS the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreducefw_spark.operators.rank import global_rank_running
from mapreducefw_spark.queries import register
from mapreducefw_spark.queries._util import t

N_EPOCHS = 3
N_SHARDS = 8


@register(
    "epoch_shuffle_assignment",
    oracle=f"""
WITH docs AS (
  SELECT doc_id FROM documents WHERE doc_id IS NOT NULL
),
epochs AS (SELECT UNNEST(range({N_EPOCHS})) AS epoch),
keyed AS (
  SELECT e.epoch, d.doc_id,
         md5('epoch' || e.epoch || ':' || d.doc_id) AS h
  FROM docs d CROSS JOIN epochs e
),
ranked AS (
  SELECT epoch, doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                                 ORDER BY h ASC, doc_id ASC) AS BIGINT)
           AS position
  FROM keyed
)
SELECT epoch, doc_id, position,
       CAST((position - 1) % {N_SHARDS} AS BIGINT) AS shard
FROM ranked
""",
)
def epoch_shuffle_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(epoch, doc_id, position, shard): per-epoch seeded-hash permutation
    with round-robin shard deal, positions via the two-phase global rank
    over the (epoch, hash) total order minus the e*N epoch offset."""
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isNotNull())
        .select("doc_id")
    )
    epochs = spark.range(N_EPOCHS).select(F.col("id").cast("bigint").alias("epoch"))
    keyed = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(F.lit("epoch"), F.col("epoch"), F.lit(":"), F.col("doc_id"))
        ).alias("h"),
    )
    ranked = global_rank_running(
        keyed, [F.asc("epoch"), F.asc("h"), F.asc("doc_id")]
    )
    n = docs.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "epoch",
            "doc_id",
            (F.col("global_rank") - F.col("epoch") * F.col("_n"))
            .cast("bigint")
            .alias("position"),
        )
        .select(
            "epoch",
            "doc_id",
            "position",
            ((F.col("position") - 1) % N_SHARDS).cast("bigint").alias("shard"),
        )
    )
