"""Local differential harness: run every registered query on Spark AND its
DuckDB oracle, compare exactly (sorted rows, columns sorted by name) — a
stricter local stand-in for the driver's order-insensitive value-hash check.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
       python tools/check_oracle.py [sf_dir] --window   # the driver's checked-50
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import duckdb
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mapreducefw_spark.queries import ORACLES, QUERIES, load_all
from mapreducefw_spark.session import get_spark
from mapreducefw_spark.sources.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows: list[tuple], cols: list[str]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return v
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, list):
            return tuple(norm_cell(x) for x in v)
        return v

    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def main() -> int:
    # flags are position-independent: strip them first, then the first
    # remaining positional is sf_dir (so `check_oracle.py --window` works)
    argv = [a for a in sys.argv[1:] if a != "--window"]
    window = "--window" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    load_all()
    if window:
        # exactly the driver's checked-50 window, in its order — the
        # pre-flight for each round's CORRECTNESS record
        names = list(QUERIES)[:50]
    else:
        names = argv[1:] or sorted(QUERIES)
    spark = get_spark(cpus=8, shuffle_partitions=8)
    con = duck_connect(sf_dir)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = QUERIES[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in ORACLES:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(ORACLES[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = True
        # Arrow-schema lint: fetchall() yields Python ints so this harness is
        # structurally blind to DuckDB HUGEINT (uncast SUM over integers) —
        # but the driver hashes Arrow values, where HUGEINT decodes as
        # decimal128(38,0) and Decimal(123) != int(123). Fail any oracle whose
        # Arrow schema carries a decimal column so the class can't recur.
        try:
            aschema = con.execute(ORACLES[name]).fetch_arrow_table().schema
            bad = [f"{f.name}:{f.type}" for f in aschema if pa.types.is_decimal(f.type)]
        except Exception:
            bad = []
        if bad:
            print(
                f"FAIL  {name}: oracle Arrow schema has decimal columns {bad} "
                "— cast to BIGINT/DOUBLE (driver hashes Decimal != int)"
            )
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns differ spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        elif len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            ok = False
        else:
            sn, dn = normalize(srows, scols), normalize(drows, dcols)
            if sn != dn:
                diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                print(f"FAIL  {name}: values differ; first diffs: {diffs}")
                ok = False
        if ok:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
