"""Custom Python Data Source (the Spark 4 `pyspark.sql.datasource`
API): a deterministic synthetic-events generator.

Why an engine needs one: load/scale testing wants "100 TB of events"
without storing 100 TB — a generator source produces any volume as a
partitioned, parallel scan with zero I/O, and deterministically (every
value is a pure function of the row id), so runs are reproducible and
results are assertable.  It also demonstrates the full custom-source
contract (name/schema/reader/partitions) that a real connector (e.g.
an internal wire format Spark has no reader for) would implement.

Scale shape: `partitions()` splits the id range into `partitions`
independent `InputPartition`s — each executor generates its slice;
there is no driver-side data, no skew (uniform ranges), and the
source composes with every downstream operator like any other scan.
Rows are yielded as plain tuples (Arrow-batched by the runtime).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_EVENT_TYPES = ("click", "view", "purchase", "error")
_BASE = _dt.datetime(2024, 1, 1)

# Knuth multiplicative hash (the corpus sampling coin) — pure integer
# arithmetic, reproducible anywhere.
def _u(key: int) -> float:
    return ((key % 2**31) * 2654435761 % 2**32) / 2**32


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.users = int(options.get("users", 100))

    def partitions(self):
        step = max(1, -(-self.rows // self.n_parts))
        return [
            _Range(lo, min(lo + step, self.rows))
            for lo in range(0, self.rows, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            ts = _BASE + _dt.timedelta(seconds=(i * 37) % 864000)
            yield (
                i,
                ts,
                int(_u(i * 3 + 1) * self.users),
                _EVENT_TYPES[int(_u(i * 3 + 2) * len(_EVENT_TYPES))],
                round(_u(i * 3 + 3) * 500.0, 2),
                '{"k": %d}' % (i % 10),
            )


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch half of the source: offsets are plain row counts —
    each trigger admits up to `rows_per_batch` new rows until `rows`
    is exhausted, then the offset stops advancing (a drained bounded
    stream).  Replayability falls out of determinism: re-reading any
    (start, end) offset range regenerates identical rows, which is
    exactly the contract checkpoint recovery needs from a source."""

    def __init__(self, options: dict):
        self.inner = SyntheticEventsReader(options)
        self.rows_per_batch = int(options.get("rows_per_batch", self.inner.rows))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        self._current = min(self._current + self.rows_per_batch, self.inner.rows)
        return {"row": self._current}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["row"], end["row"]
        n = max(1, self.inner.n_parts)
        step = max(1, -(-(hi - lo) // n))
        return [
            _Range(a, min(a + step, hi)) for a in range(lo, hi, step)
        ]

    def read(self, partition: _Range):
        return self.inner.read(partition)

    def commit(self, end: dict) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events")
    .option("rows", N).option("partitions", P).load() — or
    spark.readStream.format("synthetic_events")
    .option("rows_per_batch", B) for the micro-batch form."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp_ntz, user_id bigint, "
            "event_type string, value double, props string"
        )

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: after this,
    `spark.read.format("synthetic_events")` resolves."""
    spark.dataSource.register(SyntheticEventsDataSource)
