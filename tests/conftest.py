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
