"""Real 2-process jax.distributed run of the multi-host path.

Spawns tools/run_multihost_cpu.py, which launches a genuine 2-process CPU
cluster on localhost and asserts train+eval metric parity against a
single-process simulation of the same global batch streams (VERDICT r2 #4:
the ``process_count > 1`` branches must actually execute somewhere).
"""

import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent.parent


def test_two_process_cpu_cluster_parity():
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "run_multihost_cpu.py")],
        capture_output=True, text=True, timeout=1400)
    tail = (proc.stdout + proc.stderr)[-4000:]
    if proc.returncode == 3:
        pytest.skip(f"multi-process CPU cluster unsupported here: {tail}")
    assert proc.returncode == 0, tail
    assert '"ok": true' in proc.stdout, tail
