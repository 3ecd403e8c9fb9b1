"""Streaming MERGE: the foreachBatch deployment shape of operators/merge.py
(r12 verdict order #9).

A warehouse upsert rarely runs once — it trails a change stream. The
standard Spark pattern is ``writeStream.foreachBatch`` with a MERGE
inside each micro-batch (the Delta/Iceberg docs' canonical recipe);
``ParquetMergeSink`` is that recipe over plain parquet: every micro-batch
becomes the MERGE source against the newest PRIOR target epoch, and the
merged snapshot writes to a NEW ``epoch=<id>`` directory.

Recovery contract: the predecessor epoch is resolved FROM DISK as the
newest ``epoch=<k>`` with k < the incoming epoch_id — not from driver
memory — so after a crash+restart, foreachBatch's replay of epoch N
re-merges against the same predecessor and overwrites ``epoch=N`` in
place (idempotent given the stream checkpoint's offset replay; a
half-written epoch=N never feeds a later merge because N is not < N).
Prior epochs stay intact — the newest COMPLETE epoch is the view, the
same recovery rule as operators/ivm.ParquetViewMerger and
sources/maintenance.compact_parquet. Production systems commit the epoch
pointer through a transactional table format; the relational semantics
per batch are IDENTICAL to the batch verb (pinned stream==batch in
tests/test_streaming_merge.py).

Scale posture (100 TB target, GB-scale micro-batches): each epoch pays
merge_into's one full-outer join — one scan of the target per batch,
which is the honest cost of MERGE-on-parquet (no row-level file skipping
without a v2 table format; with Delta/Iceberg the same sink body calls
their MERGE and inherits file pruning). Clause dispatch stays whole-stage
codegen; nothing data-sized touches the driver (the epoch listing is a
directory scan).

Reference job shape: chained map -> shuffle-by-key -> reduce jobs, one
per micro-batch — `/root/reference/MRFCore.cpp:252-446` iterated.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame

from mapreducefw_spark.operators.merge import MergeClause, merge_into

_EPOCH_RE = re.compile(r"^epoch=(-?\d+)$")


class ParquetMergeSink:
    """foreachBatch sink: MERGE each micro-batch into a parquet target.

    Clause lists use the operators/merge model (full ANSI three-family
    dispatch). ``initial`` seeds ``epoch=-1`` — MERGE is defined against
    a target schema, so the sink refuses to run without a seed snapshot
    rather than inferring types from the first micro-batch."""

    def __init__(
        self,
        target_dir: str,
        *,
        on: list[str],
        matched: list[MergeClause] = (),
        not_matched: list[MergeClause] = (),
        not_matched_by_source: list[MergeClause] = (),
        initial: DataFrame | None = None,
        enforce_cardinality: bool = True,
    ) -> None:
        self.target_dir = target_dir
        self.on = list(on)
        self.matched = list(matched)
        self.not_matched = list(not_matched)
        self.not_matched_by_source = list(not_matched_by_source)
        self.enforce_cardinality = enforce_cardinality
        if initial is not None:
            initial.write.mode("overwrite").parquet(
                os.path.join(target_dir, "epoch=-1")
            )

    def _epochs(self) -> list[int]:
        try:
            names = os.listdir(self.target_dir)
        except FileNotFoundError:
            return []
        return sorted(
            int(m.group(1)) for n in names if (m := _EPOCH_RE.match(n))
        )

    def _epoch_path(self, epoch: int) -> str:
        return os.path.join(self.target_dir, f"epoch={epoch}")

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        prior = [e for e in self._epochs() if e < epoch_id]
        if not prior:
            raise RuntimeError(
                "ParquetMergeSink needs an `initial` target snapshot "
                "(epoch=-1): MERGE is defined against a target schema, and "
                "inferring one from the first micro-batch would silently "
                "bind the wrong types"
            )
        spark = batch_df.sparkSession
        target = spark.read.parquet(self._epoch_path(prior[-1]))
        merged = merge_into(
            target,
            batch_df,
            self.on,
            matched=self.matched,
            not_matched=self.not_matched,
            not_matched_by_source=self.not_matched_by_source,
            enforce_cardinality=self.enforce_cardinality,
        )
        merged.write.mode("overwrite").parquet(self._epoch_path(epoch_id))

    def snapshot(self, spark) -> DataFrame:
        """The newest complete target epoch."""
        epochs = self._epochs()
        if not epochs:
            raise RuntimeError("no epoch written yet")
        return spark.read.parquet(self._epoch_path(epochs[-1]))
