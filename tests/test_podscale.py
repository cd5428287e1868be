"""Pod-scale sharding validation on a 32-virtual-device CPU mesh.

The 8-device composed-layout coverage lives in tests/test_training.py and
``__graft_entry__.dryrun_multichip`` (which the driver runs). This gated test
re-runs the same full sweep — 2-D (16×2) data×model mesh with TP + grad
accum, FSDP on the 1-D mesh, combined TP+FSDP with a checkpoint round-trip,
and ragged data-parallel sampling — at a pod-shaped device count, in a fresh
subprocess (the in-process backend is already pinned to 8 virtual devices by
conftest.py, and XLA device count is fixed at backend init).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow  # ~32-way XLA compiles: gated tier
def test_dryrun_multichip_32_devices():
    env = {**os.environ, "PYTHONPATH": REPO}
    env.pop("XLA_FLAGS", None)  # dryrun sets its own device count
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(32)"],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    marker = [l for l in proc.stdout.splitlines() if l.startswith("dryrun_multichip(32)")]
    assert marker and "ckpt_roundtrip=OK" in marker[0] and "sharded_sampling=OK" in marker[0], (
        proc.stdout[-2000:]
    )
