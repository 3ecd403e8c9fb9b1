"""Streaming verified by batch-equivalence (SURVEY §7 M5): the same windowed
aggregation over a bounded file stream must equal the batch result."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.queries._util import t
from mapreducefw_spark.streaming import stateful, windows


@pytest.fixture(scope="module")
def batch_events(spark, sf_dir):
    return t(spark, sf_dir, "events").cache()


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_equals_batch(spark, sf_dir, batch_events):
    stream = windows.events_stream(spark, sf_dir)
    result = windows.run_bounded(windows.tumbling_counts(stream), "t_tumble")
    expected = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    cols = ["window_start", "event_type", "n"]
    assert _rows(result, cols) == _rows(expected, cols)


def test_sliding_stream_equals_batch(spark, sf_dir, batch_events):
    stream = windows.events_stream(spark, sf_dir)
    result = windows.run_bounded(windows.sliding_counts(stream), "t_slide")
    expected = (
        batch_events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    cols = ["window_start", "n"]
    assert _rows(result, cols) == _rows(expected, cols)


def test_session_stream_total_events_match(spark, sf_dir, batch_events):
    stream = windows.events_stream(spark, sf_dir)
    result = windows.run_bounded(windows.session_counts(stream, gap="30 minutes"), "t_sess")
    # session windows: total events preserved, and per-user totals match batch
    per_user = result.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    expected = batch_events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert _rows(per_user, ["user_id", "n"]) == _rows(expected, ["user_id", "n"])


def test_stateful_running_counts(spark, sf_dir, batch_events):
    stream = windows.events_stream(spark, sf_dir)
    out = windows.run_bounded(
        stateful.running_user_counts(stream), "t_state", output_mode="update"
    )
    # memory sink in update mode keeps every update; the max per user is the final state
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n"))
    expected = batch_events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    assert _rows(final, ["user_id", "n"]) == _rows(expected, ["user_id", "n"])


def test_streaming_corpus_prep_equals_batch(spark, sf_dir):
    """The corpus-prep chain (quality gate -> exact dedup) as a stream keeps
    exactly the content set the batch form keeps: which COPY survives is
    arrival-order-dependent, which CONTENT survives is not."""
    from mapreducefw_spark.queries._util import t as load
    from mapreducefw_spark.streaming import ingest

    stream = ingest.corpus_stream(spark, sf_dir)
    out = windows.run_bounded(
        ingest.streaming_corpus_prep(stream), "t_corpus_prep", output_mode="append"
    )
    stream_hashes = {r.h for r in out.select("h").collect()}

    batch = ingest.quality_gate(load(spark, sf_dir, "documents")).select(
        F.sha2("text", 256).alias("h")
    )
    batch_hashes = {r.h for r in batch.distinct().collect()}
    assert stream_hashes == batch_hashes
    assert out.count() == len(batch_hashes)  # one survivor per content


def test_streaming_bloom_decontaminate_equals_batch(spark, sf_dir):
    """The bloom probe is stateless (k broadcast joins, no aggregation), so
    the streaming flags must equal the batch flags row for row."""
    from mapreducefw_spark.operators import curation
    from mapreducefw_spark.queries._util import t as load
    from mapreducefw_spark.streaming import ingest

    docs = load(spark, sf_dir, "documents")
    contam = (
        docs.filter((F.col("doc_id") % 7 == 0) & F.col("text").isNotNull())
        .select("text")
        .distinct()
    )
    bitmap = curation.bloom_bitmap(contam)

    stream = ingest.corpus_stream(spark, sf_dir)
    out = windows.run_bounded(
        ingest.streaming_bloom_decontaminate(stream, bitmap),
        "t_bloom_stream",
        output_mode="append",
    )
    stream_flags = {r["doc_id"]: r["bloom_hit"] for r in out.select("doc_id", "bloom_hit").collect()}

    batch_flags = {
        r["doc_id"]: r["bloom_hit"]
        for r in curation.bloom_probe(docs, bitmap).select("doc_id", "bloom_hit").collect()
    }
    assert stream_flags == batch_flags
    assert any(stream_flags.values())  # the planted contamination is flagged


def test_streaming_cdc_materialize_equals_batch_apply(spark, tmp_path):
    """Folding a multi-batch changelog stream through the stateful CDC
    operator must land on exactly the batch apply_changelog answer —
    including delete-wins and out-of-order seqs split ACROSS micro-batches
    (the cross-batch state is what a per-batch batch job can't do)."""
    import random

    from mapreducefw_spark.operators import cdc
    from mapreducefw_spark.streaming import stateful

    rng = random.Random(42)
    base_rows = [(k, f"base{k}") for k in range(40)]
    base = spark.createDataFrame(base_rows, "key long, val string")

    # changelog: upserts/deletes over half the keys + brand-new keys, seqs
    # assigned then SHUFFLED so later micro-batches carry earlier seqs
    ops = []
    seq = 0
    for k in list(range(0, 40, 2)) + list(range(40, 50)):
        for _ in range(rng.randint(1, 4)):
            ops.append((k, seq, rng.choice(["U", "U", "U", "D"]), f"v{seq}"))
            seq += 1
    rng.shuffle(ops)
    changes = spark.createDataFrame(ops, "key long, seq long, op string, val string")

    expected = {
        (r["key"], r["val"])
        for r in cdc.apply_changelog(
            base, changes, key_cols=["key"], seq_col="seq", op_col="op"
        ).collect()
    }

    # stream = base as seq=-1 upserts + the shuffled changelog, written as
    # many small files so the fold genuinely crosses micro-batches
    stream_dir = str(tmp_path / "cdc_stream")
    base_as_changes = base.select(
        "key", F.lit(-1).cast("long").alias("seq"), F.lit("U").alias("op"), "val"
    )
    base_as_changes.unionByName(changes).repartition(8).write.parquet(stream_dir)
    stream = (
        spark.readStream.schema("key long, seq long, op string, val string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    out = windows.run_bounded(
        stateful.cdc_materialize(stream), "t_cdc_mat", output_mode="update"
    )
    # last emit per key = final state; tombstones drop
    final = {}
    for r in out.orderBy("seq").collect():
        final[r["key"]] = (r["seq"], r["op"], r["val"])
    got = {(k, v) for k, (s, o, v) in final.items() if o != "D"}
    assert got == expected
