"""Environment-compat shims.

``enable_system_protobuf``: Spark 4's ``transformWithStateInPandas`` speaks
a protobuf wire protocol to its Python state server, but this container
ships no ``google.protobuf`` distribution in site-packages and installs
are disallowed. A modern pure-Python protobuf runtime (6.32.0) does ship
inside the system google-cloud-sdk's App Engine platform directory; this
shim puts it on ``sys.path`` and on ``PYTHONPATH`` (so JVM-spawned Python
workers inherit it) — no files are installed or modified.

PySpark's generated ``StateMessage_pb2`` is stamped gencode 6.33.0, one
minor ahead of the 6.32.0 runtime; protobuf's validator refuses
gencode-newer-than-runtime by policy even though the wire format is
stable within a major version. We opt out via upstream's OWN escape
hatch (``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` — see
google/protobuf/runtime_version.py), scoped to this process tree. The
full TWS pipeline then runs and is asserted against batch aggregates in
tests/test_streaming.py::test_transform_with_state_matches_batch, which
xfails only if no runtime can be found at all.
"""

from __future__ import annotations

import os
import sys

# Known system locations of a pure-Python google.protobuf runtime.
_SYSTEM_PROTOBUF_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def enable_system_protobuf() -> bool:
    """Make ``google.protobuf`` importable in this process AND in Python
    workers Spark spawns later (via PYTHONPATH), using a runtime bundled
    with the system SDK. Idempotent. Returns True iff ``google.protobuf``
    imports after the call.

    Call BEFORE the SparkSession (and hence the JVM) is created —
    JVM-spawned workers inherit the JVM's environment, which inherits
    ours at launch time.
    """
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        pass
    for cand in _SYSTEM_PROTOBUF_DIRS:
        if not os.path.isdir(os.path.join(cand, "google", "protobuf")):
            continue
        if cand not in sys.path:
            sys.path.append(cand)
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if cand not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                [p for p in parts if p] + [cand]
            )
        # Upstream's documented escape hatch for the gencode(6.33) >
        # runtime(6.32) minor gap; wire format is stable within a major.
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        try:
            import google.protobuf  # noqa: F401

            return True
        except ImportError:
            continue
    return False
