"""Connected-components unit tests for the dedup canonicalization step.

Every case runs through BOTH execution paths of the hybrid (driver
union-find under the edge bound, distributed pointer-jumping above it —
forced by bound=0) and must produce identical labels.

The chain test is the scale property: with pointer jumping each round
doubles the effective propagation distance, so a 200-link chain (diameter
200) must resolve well inside the 30-round cap — plain one-hop min
propagation would need 200 rounds and previously returned silently split
components past the cap (now a RuntimeError).
"""

from __future__ import annotations

import pytest

from gasket_rs_spark.operators.dedup import _CC_DRIVER_EDGE_BOUND, _components

# bound high → driver union-find; bound 0 → distributed loop
BOUNDS = pytest.mark.parametrize(
    "bound", [_CC_DRIVER_EDGE_BOUND, 0], ids=["driver", "distributed"]
)


def _labels(df):
    return {r.doc_id: r.component for r in df.collect()}


@BOUNDS
def test_chain_converges_with_pointer_jumping(spark, bound):
    n = 200
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a bigint, doc_b bigint"
    )
    labels = _labels(_components(docs, pairs, driver_edge_bound=bound))
    assert labels == {i: 0 for i in range(n)}


@BOUNDS
def test_disjoint_clusters_and_singletons(spark, bound):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    # two triangles {1,2,3} and {5,6,7}; 0,4,8,9 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (5, 6), (6, 7)], "doc_a bigint, doc_b bigint"
    )
    labels = _labels(_components(docs, pairs, driver_edge_bound=bound))
    assert labels == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 5, 8: 8, 9: 9}


@BOUNDS
def test_empty_pair_graph_labels_all_singletons(spark, bound):
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id bigint")
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    labels = _labels(_components(docs, pairs, driver_edge_bound=bound))
    assert labels == {i: i for i in range(5)}


@BOUNDS
def test_paths_agree_on_random_graph(spark, bound):
    """Differential pin: both paths must label a pseudo-random graph
    identically (seeded — deterministic across runs)."""
    import random

    rng = random.Random(7)
    n = 120
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    pair_list = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(90)
    ]
    pair_list = [(a, b) for a, b in pair_list if a != b]
    pairs = spark.createDataFrame(pair_list, "doc_a bigint, doc_b bigint")
    got = _labels(_components(docs, pairs, driver_edge_bound=bound))
    # reference answer: pure-python union-find over the same pairs
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {i: find(i) for i in range(n)}
    assert got == want


def test_keep_best_policy_invariants(spark, sf_dir):
    """Keep-best is consistent with the component labeling: every
    multi-member component appears exactly once, the kept doc is the
    length-max (tie: min doc_id) member, and removed_tok is the rest."""
    from gasket_rs_spark.operators.dedup import q_dedup_components, q_dedup_keep_best
    from gasket_rs_spark.tables import load

    comp = {
        r.doc_id: r.component for r in q_dedup_components(spark, sf_dir).collect()
    }
    toks = {
        r.doc_id: len(r.text.split(" "))
        for r in load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    members: dict[int, list[int]] = {}
    for d, c in comp.items():
        members.setdefault(c, []).append(d)
    expected = {}
    for c, ds in members.items():
        if len(ds) < 2:
            continue
        kept = min(ds, key=lambda d: (-toks[d], d))
        expected[c] = (
            len(ds),
            kept,
            toks[kept],
            sum(toks[d] for d in ds) - toks[kept],
        )
    rows = q_dedup_keep_best(spark, sf_dir).collect()
    got = {
        r.component: (r.n_members, r.kept_doc, r.kept_tok, r.removed_tok)
        for r in rows
    }
    assert got == expected
