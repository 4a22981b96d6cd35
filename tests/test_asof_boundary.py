"""Boundary pins for the as-of join (X9), whose Spark side (union +
window carry-forward) and oracle (range join + row_number) are different
formulations — agreement on ordinary data does not prove the edges.
Synthetic rows force every boundary: click exactly at purchase time,
same-second click ties, no prior click, click only after purchase."""

from __future__ import annotations

import os

import pytest

from gasket_rs_spark.operators.relational import q_asof_join

_NS = 1_000_000_000


@pytest.fixture(scope="module")
def asof_rows(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("asof"))
    # (event_id, ts_ns, user_id, event_type)
    rows = [
        # u1: click at the exact purchase second -> must be matched
        (1, 100 * _NS, 1, "click"),
        (2, 100 * _NS, 1, "purchase"),
        # u2: two clicks in the same second -> max event_id wins
        (10, 50 * _NS, 2, "click"),
        (11, 50 * _NS, 2, "click"),
        (12, 60 * _NS, 2, "purchase"),
        # u3: purchase with no click at all -> null click columns
        (20, 70 * _NS, 3, "purchase"),
        # u4: click strictly after the purchase -> not matched
        (30, 200 * _NS, 4, "click"),
        (31, 150 * _NS, 4, "purchase"),
        # u5: interleaved -> each purchase takes the latest prior click
        (40, 10 * _NS, 5, "click"),
        (41, 15 * _NS, 5, "purchase"),
        (42, 20 * _NS, 5, "click"),
        (43, 25 * _NS, 5, "purchase"),
    ]
    df = spark.createDataFrame(
        [(e, t, u, k, 1.0, "{}") for (e, t, u, k) in rows],
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    )
    df.write.parquet(os.path.join(d, "events.parquet"))
    return d


def test_asof_join_boundaries(spark, asof_rows):
    got = {
        r["purchase_id"]: (r["click_id"], r["click_sec"])
        for r in q_asof_join(spark, asof_rows).collect()
    }
    assert got == {
        2: (1, 100),     # same-second click matches
        12: (11, 50),    # same-second click tie -> max event_id
        20: (None, None),  # no click at all
        31: (None, None),  # click only after the purchase
        41: (40, 10),
        43: (42, 20),    # latest prior click, not the first
    }
