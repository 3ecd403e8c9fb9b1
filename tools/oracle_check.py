"""Filtered driver simulation: verify NAMED queries against their DuckDB
oracles at sf0.01 (vanilla session, driver-style value hash) — the fast
per-change correctness gate for optimization work.

Usage: python tools/oracle_check.py name [name ...]
       python tools/oracle_check.py --rows name   # also print row counts only
"""

import hashlib
import math
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

names = [a for a in sys.argv[1:] if not a.startswith("-")]

spark = SparkSession.builder.master("local[8]").appName("oracle-check").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E  # noqa: E402

import duckdb  # noqa: E402

con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")


def norm(v):
    if isinstance(v, float):
        # fixed 12-sig-digit form, -0.0 folded into 0.0: a float32 column
        # vs a float64 oracle (or a signed zero) must not flag a FAIL when
        # the values are semantically equal (ADVICE r13). 12 significant
        # digits is far past every ROUND(6..9) grid the queries emit.
        return "NaN" if math.isnan(v) else f"{v + 0.0:.12g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)


def vhash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


qs, oracles = E.queries(), E.oracle_sql()
nfail = 0
for name in names:
    t0 = time.time()
    sdf = qs[name](spark, "/root/testdata/sf0.01")
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        print(f"ROWS  {name}: {len(srows)} [{time.time()-t0:.1f}s]")
        continue
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    sh, dh = vhash(srows, sdf.columns), vhash(drows, dcols)
    ok = sorted(sdf.columns) == sorted(dcols) and len(srows) == len(drows) and sh == dh
    print(
        ("PASS " if ok else "FAIL ")
        + f" {name}: {len(srows)} rows hash={sh} {'==' if sh == dh else '!='} {dh} "
        f"[{time.time()-t0:.1f}s]"
    )
    nfail += not ok
sys.exit(1 if nfail else 0)
