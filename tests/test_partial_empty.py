"""Regression pins for the round-8 ADVICE findings — each one a divergence
class the existing suites missed:

1. PARTIAL-empty databases (one table empty, the rest populated): the
   all-empty suite (`test_oracle_empty.py`) can't see a query that silently
   couples its result to an unrelated table. `scd2_point_in_time_join`
   used to build its 3-row version spine from ``region.limit(1)``, so an
   empty region parquet emptied the whole result while the oracle still
   returned 3 rows. The spine is now ``spark.range(3)``; this suite pins
   table-independence by emptying each non-participating table in turn.

2. NULL-text propagation through the SHINGLE path of
   ``portable_minhash_signatures``: concat_ws inside shingles() swallows
   the NULL slice, so without the F.when guard a NULL-text doc got the
   empty-text signature (and would pair as a near-duplicate of every
   boilerplate-empty doc). Pins: NULL text -> every h_i and band key NULL.

3. Java-vs-RE2 ``\\s`` divergence: Java's shorthand includes vertical tab
   ``\\x0B``; RE2/DuckDB's does not. `boilerplate_prefix_dup` now uses the
   explicit class ``[ \\t\\n\\r\\f\\x0B]+`` on BOTH engines; pin with a
   constructed corpus where the prefixes differ iff the classes differ.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mapreducefw_spark.operators.dedup import portable_minhash_signatures
from mapreducefw_spark.queries import ORACLES, QUERIES, load_all
from mapreducefw_spark.sources.tables import TABLES

from tests._edge_compare import assert_query_matches_oracle

load_all()


@pytest.fixture(scope="module")
def one_empty_dirs(spark, sf_dir, tmp_path_factory):
    """Dict: table-name -> database dir where ONLY that table is empty."""
    base = tmp_path_factory.mktemp("partial_empty")
    dirs = {}
    for victim in ("region", "nation", "part", "supplier"):
        d = base / victim
        for tn in TABLES:
            df = spark.read.parquet(f"{sf_dir}/{tn}.parquet")
            if tn == victim:
                df = df.limit(0)
            df.coalesce(1).write.parquet(f"{d}/{tn}.parquet")
        dirs[victim] = str(d)
    return dirs


def _duck(db_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for tn in TABLES:
        con.execute(
            f"CREATE VIEW {tn} AS SELECT * "
            f"FROM read_parquet('{db_dir}/{tn}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("victim", ["region", "nation", "part", "supplier"])
def test_scd2_independent_of_unrelated_tables(spark, one_empty_dirs, victim):
    """scd2_point_in_time_join reads only customer+orders; emptying any
    OTHER table must not change the result (3 version rows at sf0.001)."""
    d = one_empty_dirs[victim]
    sdf = QUERIES["scd2_point_in_time_join"](spark, d)
    assert_query_matches_oracle(sdf, _duck(d), ORACLES["scd2_point_in_time_join"])
    assert sdf.count() == 3


def test_portable_minhash_shingle_null_text_propagates(spark):
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d e f")], "doc_id int, text string"
    )
    sigs = portable_minhash_signatures(df, num_hashes=4, rows_per_band=2, shingle_n=3)
    rows = {r["doc_id"]: r for r in sigs.collect()}
    # NULL text: every hash and band key NULL (the documented contract)
    assert all(rows[1][c] is None for c in sigs.columns if c != "doc_id")
    # empty text still yields a (possibly degenerate) real signature —
    # distinct from the NULL row, so NULL docs can never pair with it
    assert rows[2]["band0"] is not None
    assert rows[3]["band0"] is not None
    assert rows[2]["band0"] != rows[3]["band0"]


def test_boilerplate_prefix_whitespace_class_cross_engine(spark, tmp_path):
    """Texts that differ only by a \\x0B must normalize identically on
    Spark (Java regex) and DuckDB (RE2): with Java's bare \\s+ the pair
    below collapses to one prefix on Spark but two on DuckDB."""
    docs = spark.createDataFrame(
        [
            (1, "s1", "header\x0Bline one of the template body text padded"),
            (2, "s1", "header line one of the template body text padded"),
            (3, "s1", "completely different document body"),
            (4, "s2", "tab\tand\nnewline\rand\fformfeed separated words here"),
            (5, "s2", "tab and newline and formfeed separated words here"),
        ],
        "doc_id int, source string, text string",
    )
    d = str(tmp_path / "db")
    docs.coalesce(1).write.parquet(f"{d}/documents.parquet")
    for tn in TABLES:
        if tn == "documents":
            continue
        spark.read.parquet(f"/root/testdata/sf0.001/{tn}.parquet").limit(0).coalesce(
            1
        ).write.parquet(f"{d}/{tn}.parquet")
    sdf = QUERIES["boilerplate_prefix_dup"](spark, d)
    assert_query_matches_oracle(sdf, _duck(d), ORACLES["boilerplate_prefix_dup"])
    got = {r["source"]: r["n_prefixes"] for r in sdf.collect()}
    # \x0B normalizes to ' ' on both engines -> docs 1,2 share a prefix;
    # \t\n\r\f normalize -> docs 4,5 share one
    assert got == {"s1": 2, "s2": 1}
