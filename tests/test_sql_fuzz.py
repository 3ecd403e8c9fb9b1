"""Grammar-fuzzed cross-engine differential (SQLancer-lite): generate
seeded random aggregation queries from a constrained ANSI grammar over
lineitem/orders, run the SAME text through ``spark.sql`` and DuckDB, and
compare exactly.

The curated registry proves the operators we chose; the fuzzer probes the
combinatorial space BETWEEN them — filter x grouping x aggregate
combinations nobody hand-picked — using the exact-decimal idiom so every
aggregate is order-independent. Seeds are fixed: failures reproduce, and
the corpus of generated queries is stable across runs (no Date.now-style
flakiness). 40 queries per run.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from mapreducefw_spark.sources.tables import TABLES, table

GROUP_KEYS = [
    "l_returnflag",
    "l_linestatus",
    "CAST(EXTRACT(year FROM l_shipdate) AS INTEGER)",
    "CAST(l_suppkey % 7 AS BIGINT)",
    "CAST(l_quantity >= 25 AS INTEGER)",
]
MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
PREDICATES = [
    "l_quantity BETWEEN 5 AND 45",
    "l_returnflag IN ('A', 'N')",
    "l_shipdate >= TIMESTAMP '2023-06-01 00:00:00'",
    "l_discount < 0.05",
    "l_extendedprice IS NOT NULL",
    "l_linestatus = 'F'",
    "l_partkey % 3 <> 1",
]


def _gen_query(seed: int) -> str:
    rng = random.Random(seed)
    keys = rng.sample(GROUP_KEYS, rng.randint(1, 3))
    key_aliases = [f"g{i}" for i in range(len(keys))]
    aggs = ["COUNT(*) AS n"]
    for i, m in enumerate(rng.sample(MEASURES, rng.randint(1, 3))):
        kind = rng.choice(["sum", "min", "max", "cntd"])
        if kind == "sum":
            aggs.append(
                f"CAST(SUM(CAST({m} AS DECIMAL(12,2))) AS DOUBLE) AS a{i}"
            )
        elif kind == "cntd":
            aggs.append(f"COUNT(DISTINCT {m}) AS a{i}")
        else:
            aggs.append(f"{kind.upper()}({m}) AS a{i}")
    where = ""
    if rng.random() < 0.8:
        preds = rng.sample(PREDICATES, rng.randint(1, 3))
        glue = " AND " if rng.random() < 0.7 else " OR "
        where = "WHERE " + glue.join(preds)
    having = ""
    if rng.random() < 0.3:
        having = f"HAVING COUNT(*) > {rng.randint(0, 3)}"
    sel_keys = ", ".join(f"{k} AS {a}" for k, a in zip(keys, key_aliases))
    return (
        f"SELECT {sel_keys}, {', '.join(aggs)} FROM lineitem {where} "
        f"GROUP BY {', '.join(key_aliases)} {having} "
        f"ORDER BY {', '.join(key_aliases)}"
    )


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    for tn in TABLES:
        table(spark, sf_dir, tn).createOrReplaceTempView(tn)
    con = duckdb.connect()
    for tn in TABLES:
        con.execute(f"CREATE VIEW {tn} AS SELECT * FROM '{sf_dir}/{tn}.parquet'")
    return spark, con


def _norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _key(row):
    return tuple((v is None, str(type(v)), v if v is not None else 0) for v in row)


@pytest.mark.parametrize("seed", range(40))
def test_fuzzed_aggregation_matches_duckdb(engines, seed):
    spark, con = engines
    sql = _gen_query(seed)
    srows = sorted(
        (tuple(_norm(v) for v in r) for r in spark.sql(sql).collect()), key=_key
    )
    drows = sorted(
        (tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()), key=_key
    )
    assert srows == drows, f"seed {seed} diverged:\n{sql}"


JOINS = [
    ("orders", "lineitem.l_orderkey = orders.o_orderkey"),
    ("part", "lineitem.l_partkey = part.p_partkey"),
    ("supplier", "lineitem.l_suppkey = supplier.s_suppkey"),
]
JOIN_KEYS = [
    "l_returnflag",
    "o_orderpriority",
    "p_brand",
    "s_nationkey",
    "CAST(EXTRACT(year FROM o_orderdate) AS INTEGER)",
]
JOIN_MEASURES = ["l_quantity", "o_totalprice", "p_retailprice", "s_acctbal"]
JOIN_PREDS = [
    "o_totalprice > 1000",
    "p_size BETWEEN 10 AND 40",
    "s_acctbal >= 0",
    "l_discount < 0.08",
    "o_orderpriority <> '5-LOW'",
]


def _tables_of(expr: str) -> set:
    return {
        t
        for t, pref in (
            ("lineitem", "l_"), ("orders", "o_"), ("part", "p_"), ("supplier", "s_")
        )
        if pref in [expr[i:i + 2] for i in range(len(expr))]
    }


def _gen_join_query(seed: int) -> str:
    rng = random.Random(10_000 + seed)
    joins = rng.sample(JOINS, rng.randint(1, 2))
    jtypes = [rng.choice(["JOIN", "LEFT JOIN"]) for _ in joins]
    avail = {"lineitem"} | {t for t, _ in joins}

    def usable(expr):
        return _tables_of(expr) <= avail

    keys = rng.sample([k for k in JOIN_KEYS if usable(k)], 1)
    keys += rng.sample([k for k in JOIN_KEYS if usable(k) and k not in keys],
                       rng.randint(0, 1))
    aggs = ["COUNT(*) AS n"]
    for i, m in enumerate(rng.sample([m for m in JOIN_MEASURES if usable(m)],
                                     rng.randint(1, 2))):
        if rng.random() < 0.6:
            aggs.append(f"CAST(SUM(CAST({m} AS DECIMAL(14,2))) AS DOUBLE) AS a{i}")
        else:
            aggs.append(f"{rng.choice(['MIN', 'MAX'])}({m}) AS a{i}")
    where = ""
    # predicates only over INNER-joined tables: a WHERE on a LEFT-joined
    # table's column silently converts the join — legal SQL, but keep the
    # generated intent unambiguous
    inner = {"lineitem"} | {t for (t, _), jt in zip(joins, jtypes) if jt == "JOIN"}
    cand = [p for p in JOIN_PREDS if _tables_of(p) <= inner]
    if cand and rng.random() < 0.7:
        where = "WHERE " + " AND ".join(rng.sample(cand, min(len(cand), rng.randint(1, 2))))
    key_aliases = [f"g{i}" for i in range(len(keys))]
    sel = ", ".join(f"{k} AS {a}" for k, a in zip(keys, key_aliases))
    join_sql = " ".join(
        f"{jt} {t} ON {cond}" for (t, cond), jt in zip(joins, jtypes)
    )
    return (
        f"SELECT {sel}, {', '.join(aggs)} FROM lineitem {join_sql} {where} "
        f"GROUP BY {', '.join(key_aliases)} ORDER BY {', '.join(key_aliases)}"
    )


@pytest.mark.parametrize("seed", range(30))
def test_fuzzed_join_aggregation_matches_duckdb(engines, seed):
    spark, con = engines
    sql = _gen_join_query(seed)
    srows = sorted(
        (tuple(_norm(v) for v in r) for r in spark.sql(sql).collect()), key=_key
    )
    drows = sorted(
        (tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()), key=_key
    )
    assert srows == drows, f"seed {seed} diverged:\n{sql}"


WIN_PARTS = ["l_returnflag", "l_linestatus", "CAST(l_suppkey % 5 AS BIGINT)"]
WIN_ORDERS = ["l_extendedprice", "l_quantity", "l_shipdate", "l_discount"]
WIN_FNS = ["ROW_NUMBER()", "RANK()", "DENSE_RANK()", "NTILE(4)"]


def _gen_window_query(seed: int) -> str:
    rng = random.Random(20_000 + seed)
    part = rng.sample(WIN_PARTS, rng.randint(1, 2))
    order = rng.sample(WIN_ORDERS, rng.randint(1, 2))
    # explicit direction + NULLS placement on every key: Spark defaults
    # NULLS FIRST on ASC, DuckDB NULLS LAST — the explicit spec removes the
    # divergence; (l_orderkey, l_linenumber) tiebreak totalizes the order
    okeys = [
        f"{k} {rng.choice(['ASC', 'DESC'])} NULLS "
        f"{rng.choice(['FIRST', 'LAST'])}"
        for k in order
    ] + ["l_orderkey ASC", "l_linenumber ASC"]
    fn = rng.choice(WIN_FNS)
    lag_expr = ""
    if rng.random() < 0.5:
        lag_expr = ", LAG(l_extendedprice) OVER w AS prev_price"
    win = f"PARTITION BY {', '.join(part)} ORDER BY {', '.join(okeys)}"
    return (
        f"SELECT l_orderkey, l_linenumber, {fn} OVER w AS rk{lag_expr} "
        f"FROM lineitem WHERE l_quantity <= {rng.randint(10, 50)} "
        f"WINDOW w AS ({win}) "
        f"ORDER BY l_orderkey, l_linenumber"
    )


@pytest.mark.parametrize("seed", range(20))
def test_fuzzed_window_functions_match_duckdb(engines, seed):
    spark, con = engines
    sql = _gen_window_query(seed)
    srows = sorted(
        (tuple(_norm(v) for v in r) for r in spark.sql(sql).collect()), key=_key
    )
    drows = sorted(
        (tuple(_norm(v) for v in r) for r in con.execute(sql).fetchall()), key=_key
    )
    assert srows == drows, f"seed {seed} diverged:\n{sql}"
