"""Custom Python Data Source (Spark 4 DataSource API).

The reference engine's only custom input is its directory-scan source
(``/root/reference/SearchMRC.cpp:46-98``: user code hands the framework an
arbitrary item stream). Spark 4's Python DataSource API is the modern
extension point for exactly that: a user-defined source that the engine
schedules like any other scan — schema, PARTITIONED reads (each
InputPartition becomes a task, so a custom source parallelizes across the
cluster instead of funneling through the driver), and predicate-agnostic
iteration. This module ships a deterministic arithmetic source used to
prove the wiring end-to-end; a real deployment would back it with an API
pager, a message-queue snapshot, a proprietary format reader, etc.

Everything yielded is computed per-partition inside executors — no driver
materialization, no shared state between partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class SquaresDataSource(DataSource):
    """``spark.read.format("squares").option("n", N).option("partitions", P)``
    — rows (id, square) for id in [0, N), split round-robin over P
    partition tasks. Deterministic: any engine or run yields the same set.
    """

    @classmethod
    def name(cls) -> str:
        return "squares"

    def schema(self) -> str:
        return "id bigint, square bigint"

    def reader(self, schema) -> "SquaresReader":
        return SquaresReader(self.options)

    def simpleStreamReader(self, schema) -> "SquaresStreamReader":
        return SquaresStreamReader(self.options)


class SquaresReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 8))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        # round-robin strip per partition: balanced without coordination
        for x in range(partition.value, self.n, self.parts):
            yield (x, x * x)


class SquaresStreamReader(SimpleDataSourceStreamReader):
    """Streaming face of the same source: offsets are plain dicts
    ``{"cursor": next_id}`` checkpointed by the engine, each micro-batch
    covers [start, start + batch) — the minimal custom streaming source
    (an API poller / queue tail in production). ``readBetweenOffsets``
    replays a committed range deterministically, which is what makes the
    source exactly-once under checkpoint recovery.
    """

    def __init__(self, options) -> None:
        self.n = int(options.get("n", 1000))
        self.batch = int(options.get("batch", 100))

    def initialOffset(self) -> dict:
        return {"cursor": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["cursor"])
        hi = min(lo + self.batch, self.n)
        return iter([(x, x * x) for x in range(lo, hi)]), {"cursor": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(
            [(x, x * x) for x in range(int(start["cursor"]), int(end["cursor"]))]
        )


def register(spark) -> None:
    """Idempotent registration (re-registering replaces the prior entry)."""
    spark.dataSource.register(SquaresDataSource)
