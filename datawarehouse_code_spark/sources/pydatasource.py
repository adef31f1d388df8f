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
    InputPartition,
    SimpleDataSourceStreamReader,
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


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch half of the source: offsets are plain row counts —
    each trigger admits up to `rows_per_batch` new rows until `rows`
    is exhausted, after which reads return empty batches (a drained
    bounded stream).

    This is the SIMPLE stream-reader variant deliberately: it holds NO
    process-local progress state — `read(start)` derives everything
    from the offset Spark passes in, so a checkpoint restart (which
    rebuilds the reader in a fresh process) resumes exactly where the
    committed offset says.  The first implementation tracked progress
    in an instance counter and would regress offsets after restart,
    re-emitting already-committed rows.  `readBetweenOffsets` replays
    any committed range bit-identically (determinism is the replay
    contract).  Simple readers run on the driver — right for a
    bounded demo/test source; the batch reader remains the
    partitioned parallel path.
    """

    def __init__(self, options: dict):
        self.inner = SyntheticEventsReader(options)
        self.rows_per_batch = int(options.get("rows_per_batch", self.inner.rows))

    def initialOffset(self) -> dict:
        return {"row": 0}

    def read(self, start: dict):
        # a LIST, not the generator: the simple-reader architecture
        # prefetches on the driver and ships the batch to executors by
        # pickle, and generators don't pickle
        lo = start["row"]
        hi = min(lo + self.rows_per_batch, self.inner.rows)
        return list(self.inner.read(_Range(lo, hi))), {"row": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return list(self.inner.read(_Range(start["row"], end["row"])))

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

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: after this,
    `spark.read.format("synthetic_events")` resolves."""
    spark.dataSource.register(SyntheticEventsDataSource)
