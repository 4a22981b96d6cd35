"""Randomized differential testing for the as-of join: the Spark side is
a union + window carry-forward, the oracle a range join + row_number —
structurally different formulations, so agreement is checked on random
event tables dense with the collisions that stress them (same-second
click/purchase pairs, duplicate click seconds, purchase-first users)."""

from __future__ import annotations

import os
import random

import duckdb
import pandas as pd
import pytest

from gasket_rs_spark.operators.relational import q_asof_join


# Fuzz lane (VERDICT r14 #4): randomized/property spec — excluded from
# the default pytest lane (see pytest.ini); run via -m fuzz.
pytestmark = pytest.mark.fuzz

_NS = 1_000_000_000


def _gen_events(rng: random.Random) -> list[tuple[int, int, int, str]]:
    rows = []
    eid = 0
    for user in range(rng.randint(2, 4)):
        t = 0
        for _ in range(rng.randint(4, 20)):
            t += rng.choice([0, 0, 1, 5, 60])  # heavy same-second collisions
            kind = rng.choice(["click", "purchase"])
            eid += 1
            rows.append((eid, t, user, kind))
    return rows


@pytest.mark.parametrize("seed", range(6))
def test_asof_fuzz_matches_range_join_oracle(spark, tmp_path, seed):
    rng = random.Random(6000 + seed)
    rows = _gen_events(rng)
    d = str(tmp_path)
    spark.createDataFrame(
        [(e, t * _NS, u, k, 1.0, "{}") for (e, t, u, k) in rows],
        "event_id bigint, ts bigint, user_id bigint, event_type string, value double, props string",
    ).write.parquet(os.path.join(d, "events.parquet"))

    got = {
        (r["purchase_id"], r["click_id"], r["click_sec"])
        for r in q_asof_join(spark, d).collect()
    }

    pdf = pd.DataFrame(rows, columns=["event_id", "ts_sec", "user_id", "event_type"])
    con = duckdb.connect()
    con.register("ev", pdf)
    want = {
        (int(p), None if c is None else int(c), None if s is None else int(s))
        for p, c, s in con.execute(
            """
            WITH c AS (
                SELECT user_id, ts_sec AS click_sec, event_id AS click_id
                FROM ev WHERE event_type = 'click'
            ), p AS (
                SELECT user_id, ts_sec AS purchase_sec, event_id AS purchase_id
                FROM ev WHERE event_type = 'purchase'
            )
            SELECT purchase_id, click_id, click_sec
            FROM (
                SELECT p.purchase_id, c.click_id, c.click_sec,
                       row_number() OVER (PARTITION BY p.purchase_id
                                          ORDER BY c.click_sec DESC, c.click_id DESC) AS rn
                FROM p LEFT JOIN c
                  ON p.user_id = c.user_id AND c.click_sec <= p.purchase_sec
            ) t
            WHERE rn = 1
            """
        ).fetchall()
    }
    assert got == want, f"seed {seed} diverged"
