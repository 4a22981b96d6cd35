"""gasket_rs_spark — a PySpark-native analytics/pipeline engine.

Re-expresses the capabilities of the reference pipeline framework
(construkts/gasket-rs, a Rust SEDA/staged-pipeline library — see SURVEY.md)
as an idiomatic Spark engine:

- ``pipeline/``  — tier-R parity: stages, ports/wiring, retries with
  exponential backoff, daemon supervision, metrics
  (reference: gasket/src/{framework,messaging,runtime,retries,metrics}.rs).
- ``operators/`` — tier-X relational + LLM-data operators (joins, aggs,
  windows, dedup, similarity search, text analysis, multimodal columns).
- ``functions/`` — scalar/array/JSON function surface.
- ``streaming/`` — event-time windowing, watermark, stateful dedup.
- ``sources/``   — batch/stream readers and writers.
- ``registry``   — the single catalog mapping query names to (callable,
  DuckDB oracle SQL) consumed by ``__spark_entry__.py``.

Everything is built on the public PySpark DataFrame/SQL API; plans are
declared lazily so Catalyst handles pushdown/pruning/join selection, and
every operator is designed to scale to a multi-executor cluster (broadcast
hints for dims, no driver-side collects in the data path, LSH scale paths
for the O(n^2) similarity ops).
"""

__version__ = "0.1.0"
