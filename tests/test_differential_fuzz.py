"""Randomized differential testing: one seeded spec → compiled to BOTH a
DataFrame plan and DuckDB SQL → results compared row-for-row.

Where the oracle queries pin ~80 hand-written shapes, this sweeps a
family of generated filter/project/aggregate/sort plans over lineitem and
orders, catching operator-combination bugs no hand-written witness thought
of. Fully deterministic (seeded) so failures reproduce.
"""

from __future__ import annotations

import math
import random

import duckdb
import pytest

from pyspark.sql import functions as F

from gasket_rs_spark.tables import load

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
STR_COLS = ["l_returnflag", "l_linestatus"]
KEY_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]


def _gen_spec(rng: random.Random) -> dict:
    preds = []
    for _ in range(rng.randint(1, 3)):
        kind = rng.choice(["num_gt", "num_lt", "str_eq", "key_mod"])
        if kind == "num_gt":
            c = rng.choice(NUM_COLS)
            preds.append((kind, c, round(rng.uniform(0.0, 30.0), 2)))
        elif kind == "num_lt":
            c = rng.choice(NUM_COLS)
            preds.append((kind, c, round(rng.uniform(1000.0, 50000.0), 2)))
        elif kind == "str_eq":
            c = rng.choice(STR_COLS)
            preds.append((kind, c, rng.choice(["A", "R", "N", "F", "O"])))
        else:
            c = rng.choice(KEY_COLS)
            preds.append((kind, c, rng.randint(2, 7)))
    group = rng.choice(STR_COLS + [None])
    aggs = rng.sample(
        [("sum", rng.choice(NUM_COLS)), ("min", rng.choice(NUM_COLS)),
         ("max", rng.choice(NUM_COLS)), ("count", "*")],
        k=rng.randint(1, 3),
    )
    return {"preds": preds, "group": group, "aggs": aggs}


def _to_spark(df, spec):
    cond = None
    for kind, c, v in spec["preds"]:
        if kind == "num_gt":
            p = F.col(c) > v
        elif kind == "num_lt":
            p = F.col(c) < v
        elif kind == "str_eq":
            p = F.col(c) == v
        else:
            p = (F.col(c) % v) == 0
        cond = p if cond is None else (cond & p)
    df = df.where(cond)
    agg_exprs = []
    for i, (fn, c) in enumerate(spec["aggs"]):
        name = f"a{i}"
        if fn == "count":
            agg_exprs.append(F.count("*").alias(name))
        elif fn == "sum":
            # quantities are integer-valued; money cols live on a 2dp grid:
            # sums stay on-grid, so round(4) is always stable
            agg_exprs.append(F.round(F.sum(c), 4).alias(name))
        elif fn == "min":
            agg_exprs.append(F.min(c).alias(name))
        else:
            agg_exprs.append(F.max(c).alias(name))
    if spec["group"] is not None:
        return df.groupBy(spec["group"]).agg(*agg_exprs)
    return df.agg(*agg_exprs)


def _to_sql(spec) -> str:
    wh = []
    for kind, c, v in spec["preds"]:
        if kind == "num_gt":
            wh.append(f"{c} > {v}")
        elif kind == "num_lt":
            wh.append(f"{c} < {v}")
        elif kind == "str_eq":
            wh.append(f"{c} = '{v}'")
        else:
            wh.append(f"{c} % {v} = 0")
    aggs = []
    for i, (fn, c) in enumerate(spec["aggs"]):
        name = f"a{i}"
        if fn == "count":
            aggs.append(f"count(*) AS {name}")
        elif fn == "sum":
            aggs.append(f"round(sum({c}), 4) AS {name}")
        else:
            aggs.append(f"{fn}({c}) AS {name}")
    sel = ", ".join(aggs)
    sql = "SELECT "
    if spec["group"] is not None:
        sql += f"{spec['group']}, {sel} FROM lineitem"
    else:
        sql += f"{sel} FROM lineitem"
    sql += " WHERE " + " AND ".join(wh)
    if spec["group"] is not None:
        sql += f" GROUP BY {spec['group']}"
    return sql


def _canon(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    return con


@pytest.mark.parametrize("seed", range(25))
def test_random_spec_matches_duckdb(spark, sf_dir, ddb, seed):
    rng = random.Random(1000 + seed)
    spec = _gen_spec(rng)
    sdf = _to_spark(load(spark, sf_dir, "lineitem"), spec)
    scols = sorted(sdf.columns)
    srows = sorted(
        [tuple(_canon(r[c]) for c in scols) for r in sdf.collect()],
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    rel = ddb.execute(_to_sql(spec))
    dcols_raw = [d[0] for d in rel.description]
    order = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    drows = sorted(
        [tuple(_canon(r[i]) for i in order) for r in rel.fetchall()],
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )
    assert srows == drows, f"spec {spec} diverged"
