from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Must run before any SparkSession (JVM) exists: exports PYTHONPATH so
# JVM-spawned Python workers (e.g. the transformWithState state server)
# can import the system-bundled google.protobuf runtime.
from gasket_rs_spark.compat import enable_system_protobuf  # noqa: E402

enable_system_protobuf()

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from gasket_rs_spark.session import get_session

    spark = get_session("gasket-tests", cpus=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


# Guard against cross-module SQL-conf leaks: a test that sets a session
# conf and fails to restore it silently changes every LATER module's
# plans (bit us in round 8: a leaked useV1SourceList broke the DPP test
# three modules downstream). Snapshot the explicitly-SET conf map per
# module and diff-restore after it.
@pytest.fixture(autouse=True, scope="module")
def _sql_conf_guard(request):
    if "spark" not in request.fixturenames:
        yield
        return
    spark = request.getfixturevalue("spark")

    def snapshot() -> dict[str, str]:
        return {r.key: r.value for r in spark.sql("SET").collect()}

    before = snapshot()
    yield
    after = snapshot()
    for k, v in before.items():
        if after.get(k) != v:
            spark.conf.set(k, v)
    for k in after.keys() - before.keys():
        try:
            spark.conf.unset(k)
        except Exception:
            pass  # non-SQL or immutable key: leave it
