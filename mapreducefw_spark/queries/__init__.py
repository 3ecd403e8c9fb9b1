"""Query registry: every operator from SURVEY.md §2 gets a named entry.

Each entry is a callable ``(spark, sf_dir) -> DataFrame`` plus (where
SQL-expressible) an ANSI-SQL oracle string DuckDB runs on the same parquet
tables. The driver compares row count + schema + order-insensitive value hash,
so every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side effects run."""
    from mapreducefw_spark.queries import (  # noqa: F401
        relational,
        relational2,
        relational3,
        relational4,
        relational5,
        relational6,
        windows,
        windows2,
        timeseries,
        llm,
        llm_scale,
        parity,
    )
