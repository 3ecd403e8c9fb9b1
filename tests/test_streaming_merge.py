"""Streaming MERGE (foreachBatch) == the batch verb, epoch by epoch.

The r12 verdict order #9 twin: ParquetMergeSink applies operators/merge's
merge_into per micro-batch. The pin drives a real file-source stream
(maxFilesPerTrigger=1, so each staged file is one micro-batch in a known
order) and compares the final snapshot against sequentially applying the
SAME batches with the batch verb — plus the recovery rule: replaying an
epoch rewrites the same directory and leaves the final state unchanged.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.operators.merge import (
    merge_into,
    when_matched_delete,
    when_matched_update,
    when_not_matched_insert,
)
from mapreducefw_spark.streaming.merge_sink import ParquetMergeSink

SCHEMA = "k bigint, status string, total double, op string"


def _initial(spark):
    rows = [(i, "open", float(10 * i)) for i in range(8)]
    return spark.createDataFrame(rows, "k bigint, status string, total double")


# three change batches: updates, a delete + reinsert-under-new-key, and a
# late update that must see batch 2's insert as MATCHED
BATCHES = [
    [(0, "paid", 5.0, "U"), (1, "paid", 11.0, "U"), (100, "new", 1.0, "U")],
    [(2, None, None, "D"), (101, "new", 2.0, "U"), (0, "refund", -5.0, "U")],
    [(100, "paid", 3.0, "U"), (7, None, None, "D"), (102, "new", 4.0, "U")],
]


def _clauses():
    return dict(
        matched=[
            when_matched_delete(F.col("s.op") == "D"),
            when_matched_update(
                {
                    "status": F.col("s.status"),
                    "total": F.col("t.total") + F.col("s.total"),
                }
            ),
        ],
        not_matched=[
            when_not_matched_insert(
                {
                    "k": F.col("s.k"),
                    "status": F.col("s.status"),
                    "total": F.col("s.total"),
                },
                F.col("s.op") != "D",
            )
        ],
    )


def _batch_df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def staged_stream(spark, tmp_path):
    """(stream_df, in_dir): a file-source stream where each staged parquet
    file arrives as its own micro-batch, in filename order."""
    in_dir = tmp_path / "changes"
    in_dir.mkdir()
    for i, rows in enumerate(BATCHES):
        _batch_df(spark, rows).coalesce(1).write.parquet(str(in_dir / f"b{i}"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(in_dir / "b*"))
    )
    return stream


def test_stream_merge_equals_sequential_batch_merge(spark, tmp_path, staged_stream):
    target_dir = str(tmp_path / "target")
    sink = ParquetMergeSink(
        target_dir, on=["k"], initial=_initial(spark), **_clauses()
    )
    q = staged_stream.writeStream.foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # batch twin: the same change batches folded sequentially with the verb
    expect = _initial(spark)
    for rows in BATCHES:
        expect = merge_into(expect, _batch_df(spark, rows), ["k"], **_clauses())
    got = sink.snapshot(spark)
    assert _rows(got) == _rows(expect)
    # spot-check the cross-batch semantics actually exercised: 0 updated
    # twice (0+5-5), 1 updated once (10+11), 2 and 7 deleted, 100 inserted
    # in batch 0 then MATCHED-updated in batch 2 (1+3)
    final = {r.k: r for r in got.collect()}
    assert final[0].total == 0.0 and final[0].status == "refund"
    assert final[1].total == 21.0 and final[1].status == "paid"
    assert 2 not in final and 7 not in final
    assert final[100].total == 4.0 and final[100].status == "paid"


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """The recovery rule: re-running epoch N merges against the same
    predecessor (resolved from disk, not memory) and rewrites epoch=N in
    place — the final snapshot is unchanged."""
    target_dir = str(tmp_path / "target")
    sink = ParquetMergeSink(
        target_dir, on=["k"], initial=_initial(spark), **_clauses()
    )
    for epoch, rows in enumerate(BATCHES):
        sink(_batch_df(spark, rows), epoch)
    before = _rows(sink.snapshot(spark))
    # a restarted query replays epoch 2 (e.g. crash after write, before
    # the source checkpoint committed): a NEW sink instance, state from disk
    replay = ParquetMergeSink(target_dir, on=["k"], **_clauses())
    replay(_batch_df(spark, BATCHES[2]), 2)
    assert _rows(replay.snapshot(spark)) == before


def test_sink_refuses_to_run_without_seed(spark, tmp_path):
    sink = ParquetMergeSink(str(tmp_path / "t2"), on=["k"], **_clauses())
    with pytest.raises(RuntimeError, match="initial"):
        sink(_batch_df(spark, BATCHES[0]), 0)
