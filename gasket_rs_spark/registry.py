"""Central query catalog.

Aggregates every operator module's query witnesses and DuckDB oracles into
the two dicts ``__spark_entry__.py`` exposes to the driver. Adding a module:
implement ``q_*`` functions + an ``ORACLES`` dict, then list the module here.

Emission order: external harnesses may verify only a prefix of the catalog,
so the catalog is emitted in *evidence-staleness* order — least-recently
-checked first, failed-or-stale before green-and-unchanged — generated
mechanically from the committed ``CORRECTNESS_r*.json`` history by
``scripts/gen_registry_order.py`` (see its docstring for the exact policy;
re-running it reproduces the order byte-for-byte). No query is ever
dropped; with a 50-entry check window and this rotation, every query is
re-verified at most ⌈N/50⌉ rounds apart, and failures/changed code
re-surface immediately. Queries missing from the generated order (added
after the last generation) sort first, by name.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "gasket_rs_spark.operators.relational",
    "gasket_rs_spark.functions.scalar",
    "gasket_rs_spark.operators.text",
    "gasket_rs_spark.operators.dedup",
    "gasket_rs_spark.operators.curation",
    "gasket_rs_spark.operators.similarity",
    "gasket_rs_spark.operators.multimodal",
    "gasket_rs_spark.streaming.windows",
    "gasket_rs_spark.streaming.stream",
    "gasket_rs_spark.pipeline.witnesses",
    "gasket_rs_spark.functions.udf",
    "gasket_rs_spark.operators.stats",
    "gasket_rs_spark.operators.analytics",
    "gasket_rs_spark.operators.skew",
    "gasket_rs_spark.operators.profile",
    "gasket_rs_spark.operators.pii",
    "gasket_rs_spark.operators.sketches",
    "gasket_rs_spark.operators.warehouse",
    "gasket_rs_spark.operators.graph",
    "gasket_rs_spark.operators.bpe",
)


def collect_raw() -> tuple[dict[str, QueryFn], dict[str, str]]:
    """All queries + oracles in module-collection order (unordered view)."""
    queries: dict[str, QueryFn] = {}
    oracles: dict[str, str] = {}
    for modname in _MODULES:
        mod = import_module(modname)
        for attr, fn in vars(mod).items():
            if attr.startswith("q_") and callable(fn):
                name = attr[len("q_"):]
                if name in queries:
                    raise ValueError(f"duplicate query name {name!r} from {modname}")
                queries[name] = fn
        for name, sql in getattr(mod, "ORACLES", {}).items():
            if name not in queries:
                raise ValueError(f"oracle {name!r} in {modname} has no matching q_ function")
            oracles[name] = sql
    return queries, oracles


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    queries, oracles = collect_raw()
    try:
        from gasket_rs_spark.registry_order import ORDER
    except ImportError:
        ORDER = ()
    rank = {n: i for i, n in enumerate(ORDER)}
    # Unranked queries (added since the order was generated) have no
    # verification evidence at all — stalest possible, so they go first.
    ordered_names = sorted(queries, key=lambda n: (rank.get(n, -1), n))
    return {n: queries[n] for n in ordered_names}, oracles


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
