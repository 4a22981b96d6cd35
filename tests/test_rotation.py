"""CI-style pin of the catalog-rotation invariant (VERDICT r6 #2).

Fails when ``gasket_rs_spark/registry_order.py`` is out of date with the
working tree — i.e. an operator module changed after the order was last
generated, so the driver's next 50-entry correctness window would re-check
already-proven queries while changed code goes unverified. Fix by running
``python scripts/gen_registry_order.py``.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotation_invariant_holds():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_rotation.py")],
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
