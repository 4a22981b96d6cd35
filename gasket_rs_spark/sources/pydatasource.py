"""Custom Python data source (Spark 4 DataSource API) — the package's
"write a new connector" witness.

Reference parity: a Source stage is a worker that fabricates units from
nothing but its own state (SURVEY §2.1 R4; the reference's source stage
pattern is a schedule() that always returns Unit). Here the whole source
runs inside Spark's scan planning: ``partitions()`` is the schedule —
each InputPartition is a unit of work — and ``read(partition)`` is the
worker body, executed distributed, one task per partition.

The source generates a deterministic synthetic event stream (splitmix64
over the row index — no RNG state, so any partition can be regenerated
independently, which is exactly the property a restartable distributed
scan needs). ``pushFilters`` accepts event_type equality filters and
prunes generation executor-side — the Python-source analogue of parquet
predicate pushdown (the filter is applied per-row at generation; the
win is rows never crossing the source boundary, not skipped work).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

_SCHEMA_DDL = "event_id bigint, user_id bigint, event_type string, value double"


def _mix64(x: int) -> int:
    """splitmix64 — deterministic per-row randomness without RNG state."""
    z = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


@dataclass
class _Slice(InputPartition):
    start: int
    end: int


class GasketEventsReader(DataSourceReader):
    def __init__(self, schema: StructType, options) -> None:
        self.rows = int(options.get("rows", 1000))
        self.n_partitions = int(options.get("partitions", 4))
        self.keep_types: set[str] | None = None

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept event_type equality filters; return the rest unhandled.

        The pushed filter list is a conjunction (AND) and Spark does not
        re-apply handled filters, so multiple EqualTo on the same
        attribute must INTERSECT the accepted value sets — e.g.
        ``event_type='click' AND event_type='view'`` is an empty scan,
        not a union of both types.
        """
        unhandled = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("event_type",):
                if self.keep_types is None:
                    self.keep_types = {f.value}
                else:
                    self.keep_types = self.keep_types & {f.value}
            else:
                unhandled.append(f)
        return unhandled

    def partitions(self):
        per = -(-self.rows // self.n_partitions)  # ceil
        return [
            _Slice(i * per, min((i + 1) * per, self.rows))
            for i in range(self.n_partitions)
            if i * per < self.rows
        ]

    def read(self, partition: _Slice):
        for row in _gen_rows(partition.start, partition.end):
            if self.keep_types is not None and row[2] not in self.keep_types:
                continue
            yield row


class GasketEventsStreamReader(SimpleDataSourceStreamReader):
    """Streaming side of the connector (Spark 4 Python streaming source):
    offsets are plain row indexes, each microbatch emits the next
    ``batch_rows`` rows of the SAME splitmix64 stream the batch reader
    generates — so stream output is a prefix of the batch scan by
    construction (pinned in tests/test_sources.py), and any offset range
    can be regenerated for replay (``readBetweenOffsets`` falls back to
    ``read`` semantics via the stored start offset).

    Reference parity: this is R4's source stage under R3's
    WorkSchedule::Unit — initialOffset/read is schedule(), the row range
    is the unit, and the engine's checkpointed commit() is the tether's
    progress tracking."""

    def __init__(self, options) -> None:
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self):  # noqa: N802 (API name)
        return {"idx": 0}

    def read(self, start):
        lo = start["idx"]
        hi = lo + self.batch_rows
        # a LIST, not a generator: the engine pickles prefetched rows
        # into its block cache for exactly-once replay
        return list(_gen_rows(lo, hi)), {"idx": hi}

    def readBetweenOffsets(self, start, end):  # noqa: N802 (API name)
        return list(_gen_rows(start["idx"], end["idx"]))

    def commit(self, end) -> None:
        pass  # stateless source: nothing to release


def _gen_rows(lo: int, hi: int):
    for i in range(lo, hi):
        h = _mix64(i)
        etype = _EVENT_TYPES[h % len(_EVENT_TYPES)]
        yield (i, h % 100, etype, (h >> 8 & 0xFFFF) / 655.36)


class GasketEventsDataSource(DataSource):
    """spark.read.format("gasket_events").option("rows", N).load()
    or spark.readStream.format("gasket_events").load()"""

    @classmethod
    def name(cls) -> str:
        return "gasket_events"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema: StructType) -> GasketEventsReader:
        return GasketEventsReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> GasketEventsStreamReader:  # noqa: N802
        return GasketEventsStreamReader(self.options)


def register(spark) -> None:
    # Python-source filter pushdown is opt-in (Spark 4.1)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(GasketEventsDataSource)
