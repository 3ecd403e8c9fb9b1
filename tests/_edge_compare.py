"""Shared Spark-vs-DuckDB exact comparator for the NULL/edge differential
suites — one implementation of the driver-style compare (column-name-sorted,
order-insensitive, NaN/timestamp-normalized) so a comparator fix can never
silently apply to one suite and not another."""

from __future__ import annotations

import math


def norm_value(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else v
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return tuple(norm_value(x) for x in v)
    return v


def _total_order(v):
    # recursive: arrays normalize to tuples that may CONTAIN None — a
    # top-level-only guard would crash sorted() on ('a', (1.0, None))
    if isinstance(v, tuple):
        return (False, "tuple", tuple(_total_order(x) for x in v))
    return (v is None, str(type(v)), 0 if v is None else v)


def row_key(row):
    return tuple(_total_order(v) for v in row)


def assert_query_matches_oracle(sdf, con, oracle_sql: str) -> None:
    """Collect a Spark DataFrame and a DuckDB oracle result and assert
    driver-style equality: same column set, same row count, identical
    values under column-name ordering and order-insensitive row sort."""
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    res = con.execute(oracle_sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows), (len(srows), len(drows))
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
    sn = sorted((tuple(norm_value(r[i]) for i in order_s) for r in srows), key=row_key)
    dn = sorted((tuple(norm_value(r[i]) for i in order_d) for r in drows), key=row_key)
    diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not diffs, diffs[:3]
