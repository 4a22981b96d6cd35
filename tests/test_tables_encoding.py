"""Fixture-encoding invariance for the events loader.

The driver regenerates /root/testdata between rounds and events.ts has
shipped as BOTH parquet TIMESTAMP(NANOS) (round ≤5 generations — Spark 4
reads it only as nanos-long) and TIMESTAMP(MICROS) (round-6 generation —
reads as TIMESTAMP_NTZ). `tables.load` must yield bit-identical UTC
TimestampType values for the same instants regardless of which physical
encoding the current fixtures carry — otherwise every events-based
oracle silently shifts the next time the driver flips the writer.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from gasket_rs_spark.tables import load


def _write_events(dirpath, unit: str) -> None:
    base = datetime.datetime(1997, 3, 1, 12, 0, 0)
    rows = {
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "ts": pa.array(
            [base, base + datetime.timedelta(seconds=90), base + datetime.timedelta(days=2)],
            pa.timestamp(unit),
        ),
        "user_id": pa.array([10, 11, 10], pa.int64()),
        "event_type": pa.array(["click", "view", "purchase"], pa.string()),
        "value": pa.array([1.5, 2.5, 3.5], pa.float64()),
        "props": pa.array(['{"k": 1}'] * 3, pa.string()),
    }
    pq.write_table(pa.table(rows), str(dirpath / "events.parquet"))


def test_events_ts_encoding_invariance(spark, tmp_path):
    dir_ns = tmp_path / "ns"
    dir_us = tmp_path / "us"
    dir_ns.mkdir()
    dir_us.mkdir()
    _write_events(dir_ns, "ns")
    _write_events(dir_us, "us")

    a = load(spark, str(dir_ns), "events")
    b = load(spark, str(dir_us), "events")
    assert a.schema["ts"].dataType.typeName() == "timestamp"
    assert b.schema["ts"].dataType.typeName() == "timestamp"
    rows_a = sorted(a.select("event_id", "ts").collect())
    rows_b = sorted(b.select("event_id", "ts").collect())
    assert rows_a == rows_b
    # and the values are the written instants (UTC, µs precision)
    got = {r["event_id"]: r["ts"] for r in rows_a}
    assert got[1] == datetime.datetime(1997, 3, 1, 12, 0, 0)
    assert got[2] == datetime.datetime(1997, 3, 1, 12, 1, 30)
