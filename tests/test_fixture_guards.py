"""Named-error guards for degenerate/mismatched fixtures (r20).

Two witnesses bake fixture-shape assumptions into cross-engine integer
pipelines; both must fail AT THE CAUSE with a named ValueError instead
of a bare ZeroDivisionError (Spark side) or a hash mismatch far
downstream (oracle side). The production fixtures can never reach these
inputs, so only synthetic parquet exercises the guards — the same
rationale as tests/test_degenerate_guards.py's literal-input rule.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(dir_path, vectors):
    """Write <dir>/embeddings.parquet with the production schema
    (vec_id BIGINT, embedding FLOAT[], label INT)."""
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vectors)), pa.int64()),
            "embedding": pa.array(vectors, pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(vectors))], pa.int32()),
        }
    )
    pq.write_table(table, str(dir_path / "embeddings.parquet"))
    return str(dir_path)


def test_pca_zero_quantized_corpus_raises_named_error(spark, tmp_path):
    """Every |x| < 0.5/_PCA_GRID quantizes to 0: the Gram matrix is
    zero, the power iterate collapses, and the Rayleigh denominator
    hits 0. The witness must name the degenerate corpus (and the grid)
    rather than crash with ZeroDivisionError — the DuckDB replay would
    divide by zero too, so there is no EXACT row to save here."""
    from gasket_rs_spark.operators.similarity import _PCA_GRID, q_embedding_pca

    tiny = 0.4 / _PCA_GRID  # under the 0.5/GRID rounding threshold
    sf = _write_embeddings(tmp_path, [[tiny] * 64 for _ in range(20)])
    with pytest.raises(ValueError, match="quantizes to the zero matrix"):
        q_embedding_pca(spark, sf)


def test_pca_empty_corpus_raises_named_error(spark, tmp_path):
    """Zero-row embeddings: no Gram cells at all — named error, not an
    opaque max()-of-empty or IndexError."""
    from gasket_rs_spark.operators.similarity import q_embedding_pca

    sf = _write_embeddings(tmp_path, [])
    with pytest.raises(ValueError, match="embeddings table is empty"):
        q_embedding_pca(spark, sf)


def test_pq_codebooks_reject_mismatched_embedding_dim(spark, tmp_path):
    """ADVICE r19: the static PQ oracle bakes the 8×8 subspace layout;
    a fixture with embedding dim ≠ 64 must fail in train_pq_codebooks
    with the named layout error — never partition subspaces differently
    from the oracle and surface as a distant hash mismatch."""
    from gasket_rs_spark.operators.similarity import _PQ_K, train_pq_codebooks

    # dim 32 ≠ 8 subspaces × 8 dims; 200 rows so the ~25% md5-bucket
    # sample comfortably clears the >= _PQ_K sample-size guard and the
    # dim guard is the one that fires
    assert _PQ_K <= 40
    vecs = [[0.1 * ((i + j) % 7) for j in range(32)] for i in range(200)]
    sf = _write_embeddings(tmp_path, vecs)
    with pytest.raises(ValueError, match="expects embedding dim 64"):
        train_pq_codebooks(spark, sf)
