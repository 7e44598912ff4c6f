"""Genuine-reference parity (VERDICT r2 item 8).

Runs the REAL labicon/dp-ilqr package from /root/reference -- Python layers
unmodified, C++ kernel compiled verbatim through
tools/refcheck/ref_wrapper.cpp -- and asserts the oracle AND the framework
reproduce its trajectories/costs to float64 tolerance.  The parity chain
therefore no longer terminates at the self-written oracle.
"""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference"


@pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "dpilqr"))
    or shutil.which("g++") is None,
    reason="needs the reference checkout and g++",
)
def test_genuine_reference_parity():
    # Subprocess: the tool mutates sys.modules (dpilqr shim) and jax
    # default-device config; keep that out of this interpreter.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/refcheck/run_reference.py")],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]

    import json

    with open(os.path.join(REPO, "tools/refcheck/RESULT.json")) as fh:
        report = json.load(fh)
    assert report["ok"]
    for name, entry in report["scenarios"].items():
        assert entry["relerr_J_oracle_vs_genuine"] < 1e-7, (name, entry)
        assert entry["relerr_J_framework_vs_genuine"] < 1e-7, (name, entry)
        assert entry["max_abs_X_oracle_vs_genuine"] < 1e-5, (name, entry)
        assert entry["max_abs_X_framework_vs_genuine"] < 1e-5, (name, entry)
        assert entry["iters_oracle"] == entry["iters_framework"], (name, entry)
