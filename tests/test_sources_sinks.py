"""Source formats, partitioned sinks, and the filesystem-listing source
(reference Search client semantics, SearchMRC.cpp:46-98)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.queries._util import t
from mapreducefw_spark.sources import filesystem, formats


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    csv_path, json_path = str(tmp_path / "c"), str(tmp_path / "j")
    df.write.mode("overwrite").option("header", True).csv(csv_path)
    df.write.mode("overwrite").json(json_path)
    back_csv = formats.read_csv(spark, csv_path, "id int, s string")
    back_json = formats.read_json(spark, json_path, "id int, s string")
    expect = {(1, "a"), (2, "b")}
    assert {tuple(r) for r in back_csv.collect()} == expect
    assert {tuple(r) for r in back_json.collect()} == expect


def test_orc_and_text(spark, tmp_path):
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id int, s string")
    orc_path = str(tmp_path / "o")
    df.write.mode("overwrite").orc(orc_path)
    assert {tuple(r) for r in formats.read_orc(spark, orc_path).collect()} == {(1, "x"), (2, "y")}
    txt_path = str(tmp_path / "t")
    df.select("s").write.mode("overwrite").text(txt_path)
    assert {r.value for r in formats.read_text(spark, txt_path).collect()} == {"x", "y"}


def test_partitioned_parquet_prunes(spark, sf_dir, tmp_path):
    """Partitioned write + partition-pruned read — the 100 TB sink layout."""
    li = t(spark, sf_dir, "lineitem")
    out = str(tmp_path / "li")
    formats.write_partitioned_parquet(li, out, ["l_returnflag"])
    assert sorted(p for p in os.listdir(out) if p.startswith("l_returnflag=")) == [
        "l_returnflag=A",
        "l_returnflag=N",
        "l_returnflag=R",
    ]
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "A")
    expected = li.filter(F.col("l_returnflag") == "A").count()
    assert back.count() == expected
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan


def test_filesystem_search_semantics(spark, tmp_path):
    d1, d2 = tmp_path / "d1", tmp_path / "d2"
    d1.mkdir(), d2.mkdir()
    for name in ["alpha.txt", "beta.log", "alphabet.md"]:
        (d1 / name).touch()
    (d2 / "alpha.txt").touch()  # duplicate name in second dir
    (d2 / "nope.bin").touch()
    out = filesystem.search(spark, "alpha", [str(d1), str(d2), str(tmp_path / "missing")])
    keys = [r.key for r in out.collect()]
    # duplicates preserved (bag), sorted ascending, NULL payloads
    assert keys == ["alpha.txt", "alpha.txt", "alphabet.md"]
    assert all(r.value is None for r in out.collect())


def test_gated_sources_honest_about_missing_jars(spark):
    # no avro module / delta package / JDBC driver in this image: the gates
    # must report that truthfully instead of failing later mid-query
    assert formats.avro_available(spark) is False
    assert formats.delta_available() is False
    with pytest.raises(Exception):
        # wrapper builds the reader; load fails cleanly without a driver jar
        formats.read_jdbc(
            spark, "jdbc:nosuchdb://localhost/none", "t", driver="com.example.NoDriver"
        ).collect()


def test_xml_roundtrip(spark, tmp_path):
    # XML is built into Spark 4 (no external package)
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "id bigint, name string"
    )
    path = str(tmp_path / "xml_out")
    formats.write_xml(df, path, row_tag="row")
    back = formats.read_xml(spark, path, "id bigint, name string", row_tag="row")
    assert sorted(map(tuple, back.collect())) == [(1, "alpha"), (2, "beta")]


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A 100 TB dataset accretes columns over time: files written before a
    column existed must read back as NULLs under mergeSchema, and the scan
    must still prune to requested columns. Default reads take the footer of
    one file — only mergeSchema reconciles mixed vintages."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "x"), (2, "y")], "a long, b string").write.parquet(p)
    spark.createDataFrame(
        [(3, "z", 30.0)], "a long, b string, c double"
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"a", "b", "c"}
    rows = {r["a"]: (r["b"], r["c"]) for r in merged.collect()}
    assert rows == {1: ("x", None), 2: ("y", None), 3: ("z", 30.0)}

    # column pruning still reaches the merged scan
    plan = (
        merged.select("a")._jdf.queryExecution().executedPlan().toString()
    )
    assert "ReadSchema: struct<a:bigint>" in plan, plan
