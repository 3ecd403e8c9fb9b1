"""Failure-path semantics: malformed-record handling on ingest, and
streaming checkpoint/restart exactly-once — the operational guarantees a
100 TB deployment leans on when (not if) inputs are dirty and jobs die."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.queries._util import t


def test_json_corrupt_record_modes(spark, tmp_path):
    """PERMISSIVE captures broken lines in _corrupt_record (pipeline keeps
    flowing, bad rows are quarantined); DROPMALFORMED silently drops;
    FAILFAST raises — the three ingest policies."""
    p = str(tmp_path / "in.json")
    with open(p, "w") as f:
        f.write('{"a": 1, "b": "x"}\n')
        f.write('{"a": 2, "b": "y"}\n')
        f.write('{"a": THIS IS NOT JSON\n')
    schema = "a int, b string, _corrupt_record string"

    permissive = spark.read.schema(schema).json(p)
    rows = permissive.collect()
    assert len(rows) == 3
    bad = [r for r in rows if r._corrupt_record is not None]
    assert len(bad) == 1 and "NOT JSON" in bad[0]._corrupt_record

    dropped = spark.read.schema("a int, b string").option("mode", "DROPMALFORMED").json(p)
    assert dropped.count() == 2

    with pytest.raises(Exception):
        spark.read.schema("a int, b string").option("mode", "FAILFAST").json(p).collect()


def test_csv_malformed_quarantine(spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("1,alpha\n")
        f.write("2,beta\n")
        f.write("not_an_int,gamma\n")
    schema = "a int, b string, _corrupt_record string"
    df = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(p)
    rows = df.collect()
    assert len(rows) == 3
    assert sum(r._corrupt_record is not None for r in rows) == 1
    good = spark.read.schema("a int, b string").option("mode", "DROPMALFORMED").csv(p)
    assert {r.a for r in good.collect()} == {1, 2}


def test_streaming_checkpoint_restart_exactly_once(spark, sf_dir, tmp_path):
    """Kill-and-restart a file-source stream against the SAME checkpoint:
    batch-1 files must not be re-emitted after restart, and the union of the
    two runs must be exactly the source — Spark's source-offset tracking +
    idempotent file sink, the mechanism that makes 100 TB backfills safe to
    retry."""
    events = t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    total = events.count()
    hold = str(tmp_path / "hold")
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    events.repartition(4).write.parquet(hold)
    schema = spark.read.parquet(hold).schema
    files = sorted(glob.glob(f"{hold}/part-*.parquet"))
    assert len(files) == 4
    os.makedirs(src)

    def run_available() -> None:
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for f in files[:2]:
        shutil.move(f, src)
    run_available()
    n_first = spark.read.parquet(sink).count()
    assert 0 < n_first < total

    for f in files[2:]:  # "late" data lands, job restarts from checkpoint
        shutil.move(f, src)
    run_available()

    out = spark.read.parquet(sink)
    assert out.count() == total  # nothing lost, nothing duplicated
    assert out.select(F.countDistinct("event_id")).collect()[0][0] == total


def test_observe_metrics_ride_the_action(spark, sf_dir):
    """df.observe(): pipeline health metrics (row counts, null counts, sums)
    computed DURING the action as accumulators — no second scan. This is how
    a 100 TB job reports data-quality counters without doubling its I/O."""
    from pyspark.sql.observation import Observation

    obs = Observation("ingest_metrics")
    docs = t(spark, sf_dir, "documents")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.size(F.split("text", " "))).alias("n_tokens"),
        F.count(F.when(F.col("text").isNull(), 1)).alias("n_null_text"),
    )
    kept = observed.filter(F.size(F.split("text", " ")) >= 20).count()
    metrics = obs.get
    assert metrics["n_rows"] == docs.count()
    assert metrics["n_null_text"] == 0
    assert metrics["n_tokens"] > 0
    assert kept <= metrics["n_rows"]


def test_stateful_cdc_state_survives_checkpoint_restart(spark, tmp_path):
    """Kill-and-restart the stateful CDC fold against the SAME checkpoint:
    the per-key state (latest seq/op) must come back, so stale seqs and
    late pre-delete updates arriving AFTER the restart cannot overwrite or
    resurrect what the first run already applied. Asserted on the restarted
    run's own emits — not just the final union — so a silently reset state
    store cannot pass."""
    from mapreducefw_spark.streaming import stateful

    src = str(tmp_path / "cdc_src")
    ckpt = str(tmp_path / "cdc_ckpt")
    os.makedirs(src)
    schema = "key long, seq long, op string, val string"

    run1 = [(7, 100, "U", "newest7"), (9, 200, "D", ""), (1, 10, "U", "v1")]
    run2 = [(7, 60, "U", "stale7"), (9, 150, "U", "zombie9"), (1, 11, "U", "v2")]

    emitted: list = []

    def drain() -> list:
        batch_rows: list = []
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stateful.cdc_materialize(stream)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, _id: batch_rows.extend(df.collect()))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        emitted.extend(batch_rows)
        return batch_rows

    spark.createDataFrame(run1, schema).coalesce(1).write.mode("append").parquet(src)
    drain()
    spark.createDataFrame(run2, schema).coalesce(1).write.mode("append").parquet(src)
    second = drain()

    by_key_2 = {r["key"]: (r["seq"], r["op"], r["val"]) for r in second}
    # state survived: the stale seq-60 update could not displace seq 100
    assert by_key_2[7] == (100, "U", "newest7"), by_key_2
    # tombstone survived: the late pre-delete update could not resurrect key 9
    assert by_key_2[9] == (200, "D", ""), by_key_2
    # genuinely newer seq still applies after restart
    assert by_key_2[1] == (11, "U", "v2"), by_key_2

    final = {}
    for r in sorted(emitted, key=lambda r: r["seq"]):
        final[r["key"]] = (r["seq"], r["op"], r["val"])
    assert {(k, v) for k, (s, o, v) in final.items() if o != "D"} == {
        (7, "newest7"),
        (1, "v2"),
    }
