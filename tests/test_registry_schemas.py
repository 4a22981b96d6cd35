"""Registry-wide schema sweep (VERDICT r8 #2): no ORACLED witness may
expose a top-level ArrayType/MapType column.

The driver canonicalizes results via pandas ``sort_values``, which raises
``TypeError: unhashable type: 'list'`` on list/dict cells — this killed
``array_ops`` in round 1 and ``text_feature_hashing`` in round 8, and the
local harness's old tuple-izing canon() masked both. Rows-only witnesses
are exempt (the driver never hashes them).

Cost honesty (ADVICE r9): building a DataFrame is *usually* lazy (plan
analysis only), but several oracled witnesses execute real work on
construction — the stream_* pipeline functions run complete streaming
queries before returning their result frame, iterative operators
(BPE-derived, PageRank) run driver loops, and dedup constructors fire
eager localCheckpoint jobs. The sweep therefore runs at sf0.001 where
those executions cost ~seconds, and this is accepted: schema-from-
execution at the smallest SF is still the cheapest faithful source
(deriving schemas any other way would not exercise the code path the
driver actually calls).
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_no_oracled_witness_exposes_array_or_map_columns(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    offenders: dict[str, list[str]] = {}
    for name in sorted(oracles):
        assert name in qs, f"oracle_sql has {name} but queries() does not"
        schema = qs[name](spark, SF_DIR).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracled witnesses expose driver-unsortable top-level array/map "
        f"columns (flatten with array_join or explode to rows): {offenders}"
    )


def test_verify_local_guard_agrees_with_this_sweep(spark):
    """The harness-side guard (scripts/verify_local.py) must flag exactly
    the same schemas this test flags — pin both ends of the invariant."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
    from verify_local import _driver_unsortable_columns

    from pyspark.sql import functions as F

    flat = spark.range(1).select(F.lit("a").alias("s"), F.struct(F.lit(1)).alias("st"))
    assert _driver_unsortable_columns(flat.schema) == []
    arr = spark.range(1).select(F.array(F.lit(1)).alias("a"), F.create_map().alias("m"))
    assert _driver_unsortable_columns(arr.schema) == ["a", "m"]
