"""REAL multi-process execution of the sharded train step.

tests/test_multihost_sharding.py covers the per-host input *assembly*
logic by simulation (process_index/process_count plumbed by hand); this
test runs the actual thing: two `jax.distributed`-coordinated processes
(4 virtual CPU devices each) jit the full train step over one global
8-device mesh, gradients all-reduce across the process boundary over
Gloo, and the result must equal a single-process 8-device run
(tools/run_multihost.py asserts both properties and exits nonzero
otherwise). On a real pod the same program rides ICI/DCN — this is the
closest a 1-host environment can get to SURVEY §5.8's multi-host row.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_train_step_matches_single_process():
    # subprocess: the launcher must control JAX env per worker; this
    # pytest process already holds an initialized 8-device CPU backend
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "run_multihost.py"),
         "--procs", "2"],
        cwd=REPO, capture_output=True, text=True, timeout=840)
    assert proc.returncode == 0, (
        f"multihost validation failed:\n{proc.stdout[-3000:]}\n"
        f"{proc.stderr[-3000:]}")
    assert "multihost ok: 2 processes" in proc.stdout
