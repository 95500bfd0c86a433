"""Deterministic synthetic-events connector on the Spark 4 Python
DataSource API (`pyspark.sql.datasource` — the public extension point for
systems without a built-in connector).

Two read paths over the same generator:

- batch (`DataSourceReader`): `partitions()` splits the row range into
  `numPartitions` contiguous slices, so generation is partition-parallel —
  each executor materializes only its slice. This is the contract any real
  connector (REST pages, kafka-like segments, cursor shards) must honor for
  the scan to scale; the synthetic generator makes it testable without a
  network.
- streaming (`SimpleDataSourceStreamReader`): offsets are plain row
  indices; each micro-batch reads `rowsPerBatch` rows past the last
  committed offset. Replaying the same offset range yields identical rows
  (pure function of the index), which is exactly the contract Structured
  Streaming needs from a replayable source.

Rows are a pure function of (seed, index) through the portable 60-bit MD5
prefix — no RNG state, so any engine (or test) can regenerate a slice
bit-for-bit. Register with `spark.dataSource.register(SyntheticEvents)`,
then `spark.read.format("synthetic_events")`.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "event_id long, user_id long, event_type string, value double"

_EVENT_TYPES = ("view", "click", "purchase", "signup", "error")


def _h60(seed: int, i: int, field: str) -> int:
    """Portable 60-bit MD5 prefix of 'seed|i|field' (functions/hashing.py
    scheme — deterministic across processes, partitionings, engines)."""
    return int(hashlib.md5(f"{seed}|{i}|{field}".encode()).hexdigest()[:15], 16)


def _row(seed: int, i: int) -> tuple[int, int, str, float]:
    return (
        i,
        _h60(seed, i, "user") % 1000,
        _EVENT_TYPES[_h60(seed, i, "type") % len(_EVENT_TYPES)],
        (_h60(seed, i, "value") % 1_000_000) / 1000.0,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.num_partitions = int(options.get("numPartitions", 4))
        self.seed = int(options.get("seed", 0))

    def partitions(self) -> list[InputPartition]:
        n = max(1, self.num_partitions)
        step = -(-self.rows // n)  # ceil
        return [
            _RangePartition(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Offsets are dicts (JSON-serializable, per the API): {"index": n}.

    `maxRows` bounds the stream (0 = unbounded): past it, read() returns an
    empty batch with an unchanged offset, so availableNow/processAllAvailable
    terminates — the testable-finite-stream pattern."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))
        self.seed = int(options.get("seed", 0))
        self.max_rows = int(options.get("maxRows", 0))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["index"]
        hi = lo + self.rows_per_batch
        if self.max_rows > 0:
            hi = min(hi, self.max_rows)
        if hi <= lo:
            return (iter([]), {"index": lo})
        return (iter([_row(self.seed, i) for i in range(lo, hi)]), {"index": hi})

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # Replay path after restart: must regenerate the identical rows —
        # trivially true because rows are a pure function of the index.
        return iter([_row(self.seed, i) for i in range(start["index"], end["index"])])


class SyntheticEvents(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SyntheticBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SyntheticStreamReader(self.options)
