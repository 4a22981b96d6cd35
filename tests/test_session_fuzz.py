"""Randomized differential testing for session-window semantics — the
operator family where plausible-but-wrong boundary reasoning survived a
green gate in round 2 (no natural data row sits exactly on the gap).

Timestamps are drawn from a coarse grid that INCLUDES exact gap
multiples, so every run contains boundary collisions; the DuckDB side
uses the islands formulation with the strictly-greater break that
matches Spark's merge-at-exactly-gap behavior.
"""

from __future__ import annotations

import datetime
import random

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F


# Fuzz lane (VERDICT r14 #4): randomized/property spec — excluded from
# the default pytest lane (see pytest.ini); run via -m fuzz.
pytestmark = pytest.mark.fuzz

_GAP_SEC = 1800
_T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _gen_events(rng: random.Random) -> list[tuple[int, datetime.datetime]]:
    rows = []
    for user in range(rng.randint(2, 5)):
        t = 0
        for _ in range(rng.randint(3, 25)):
            # steps on a grid of quarter-gaps: exact-gap and exact-2×gap
            # deltas occur constantly, plus same-second duplicates (step 0)
            t += rng.choice([0, 1, _GAP_SEC // 4, _GAP_SEC // 2, _GAP_SEC, _GAP_SEC + 1, 2 * _GAP_SEC])
            rows.append((user, _T0 + datetime.timedelta(seconds=t)))
    return rows


@pytest.mark.parametrize("seed", range(10))
def test_session_window_fuzz_matches_islands_oracle(spark, seed):
    rng = random.Random(4000 + seed)
    rows = _gen_events(rng)
    sdf = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
    got = {
        (r["user_id"], r["session_start"], r["n"])
        for r in (
            sdf.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count("*").alias("n"))
            .select("user_id", F.col("w.start").alias("session_start"), "n")
            .collect()
        )
    }
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    con = duckdb.connect()
    con.register("events", pdf)
    want = {
        (int(u), s, int(n))
        for u, s, n in con.execute(
            """
            WITH marked AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts)
            ), labeled AS (
                SELECT user_id, ts,
                       sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM marked
            )
            SELECT user_id, min(ts) AS session_start, count(*) AS n
            FROM labeled GROUP BY user_id, sid
            """
        ).fetchall()
    }
    assert got == want, f"seed {seed}: session sets diverged"
