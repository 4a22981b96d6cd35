"""Connected-components unit tests for the dedup canonicalization step.

The chain test is the scale property: with pointer jumping each round
doubles the effective propagation distance, so a 200-link chain (diameter
200) must resolve well inside the 30-round cap — plain one-hop min
propagation would need 200 rounds and previously returned silently split
components past the cap (now a RuntimeError).
"""

from __future__ import annotations

from gasket_rs_spark.operators.dedup import _components


def _labels(df):
    return {r.doc_id: r.component for r in df.collect()}


def test_chain_converges_with_pointer_jumping(spark):
    n = 200
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a bigint, doc_b bigint"
    )
    labels = _labels(_components(docs, pairs))
    assert labels == {i: 0 for i in range(n)}


def test_disjoint_clusters_and_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id bigint")
    # two triangles {1,2,3} and {5,6,7}; 0,4,8,9 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (5, 6), (6, 7)], "doc_a bigint, doc_b bigint"
    )
    labels = _labels(_components(docs, pairs))
    assert labels == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5, 7: 5, 8: 8, 9: 9}


def test_empty_pair_graph_labels_all_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id bigint")
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    labels = _labels(_components(docs, pairs))
    assert labels == {i: i for i in range(5)}
