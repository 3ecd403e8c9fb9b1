"""Change-data-capture apply: fold an insert/update/delete changelog into a
base snapshot — the MERGE INTO of a lakehouse pipeline, expressed on plain
DataFrames.

Scale design (100 TB base, ~GB-scale daily changelog — the usual shape):
the base table is touched by exactly ONE pass and ONE join. The changelog is
first reduced to its latest op per key (a window over the changelog only —
the base never enters a window), and when ``broadcast_changes`` is set the
anti-join against the base is a broadcast hash join, so the base is never
shuffled at all: scan, hash-probe, write. With a transactional table format
the same plan runs as MERGE; this operator is the format-agnostic core.

Contract: (key, seq) pairs are unique within the changelog (any CDC source
with an LSN/offset provides this); ops are 'I'/'U'/'D'. 'I' and 'U' are both
upserts (last-writer-wins on seq) — a real CDC stream's I-vs-U distinction
encodes source-side knowledge this operator doesn't need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    *,
    key_cols: list[str],
    seq_col: str = "seq",
    op_col: str = "op",
    broadcast_changes: bool = True,
) -> DataFrame:
    """New snapshot = base minus changed keys, plus latest non-delete rows.

    ``changes`` carries the same payload columns as ``base`` plus
    (op_col, seq_col). Returns base's columns exactly.

    ``broadcast_changes`` assumes the documented shape: a changelog orders of
    magnitude smaller than the base (daily CDC). It force-broadcasts the
    changed-key set past autoBroadcastJoinThreshold, so a corpus-scale
    changelog (bulk backfill, full re-snapshot) MUST pass
    ``broadcast_changes=False`` or risk OOMing the driver — same contract as
    ``similarity.broadcast_queries``. With False the anti-join plans as a
    sort-merge on the key, which is the right plan at that size.
    """
    payload = base.columns
    w = W.partitionBy(*key_cols).orderBy(F.col(seq_col).desc())
    latest = (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    changed_keys = latest.select(*key_cols)
    if broadcast_changes:
        changed_keys = F.broadcast(changed_keys)
    untouched = base.join(changed_keys, key_cols, "left_anti")
    upserts = latest.filter(F.col(op_col) != "D").select(*payload)
    return untouched.unionByName(upserts)
