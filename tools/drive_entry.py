"""Simulate the driver: vanilla session, import contract, smoke + differential."""
import sys, hashlib, math, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# vanilla session, as the driver would build it -- none of the repo's configs
spark = SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

# 1) smoke: entry() on sf0.001
df = E.entry(spark)
rows = df.collect()
print("SMOKE rows:", len(rows), "schema:", [f.name for f in df.schema.fields])
assert len(rows) > 0
print("SMOKE sample:", rows[0])

# 2) differential at sf0.01, driver-style: sort cols by name, order-insensitive value hash
import duckdb
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'")

def norm(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if hasattr(v, "isoformat"): return v.isoformat()
    if isinstance(v, list): return "[" + ",".join(norm(x) for x in v) + "]"
    return repr(v)

def vhash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]

qs, oracles = E.queries(), E.oracle_sql()
print(f"{len(qs)} queries, {len(oracles)} oracles")
npass = nfail = nrows = 0
for name in sorted(qs):
    t0 = time.time()
    sdf = qs[name](spark, "/root/testdata/sf0.01")
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        print(f"ROWS  {name}: {len(srows)}"); nrows += 1; continue
    res = con.execute(oracles[name]); dcols = [d[0] for d in res.description]; drows = res.fetchall()
    sh, dh = vhash(srows, sdf.columns), vhash(drows, dcols)
    ok = sorted(sdf.columns) == sorted(dcols) and len(srows) == len(drows) and sh == dh
    print(("PASS " if ok else "FAIL ") + f" {name}: {len(srows)} rows hash={sh} {'==' if sh==dh else '!='} {dh} [{time.time()-t0:.1f}s]")
    npass += ok; nfail += (not ok)
print(f"TOTAL: {npass} pass, {nfail} fail, {nrows} rows-only")
sys.exit(1 if nfail else 0)
