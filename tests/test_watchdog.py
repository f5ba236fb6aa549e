"""Stall watchdog + supervised resume (SURVEY §5.3 failure detection).

The production failure mode this guards is a device call whose relay
response is lost: the step loop blocks forever with zero CPU (observed
live, round 3). The watchdog converts that into exit 42; the
supervisor relaunches with --resume True.
"""

import copy
import os
import subprocess
import sys
import time

import numpy as np
import pytest

from semi_tpu.train.watchdog import STALL_EXIT_CODE, StallWatchdog

from test_trainer import TINY_CONFIG, _write_config  # noqa: F401

# subprocesses must not claim the TPU tunnel (sitecustomize registers
# at interpreter start) nor pick a non-CPU platform
_ENV = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}


def test_fires_on_stall():
    fired = []
    wd = StallWatchdog(0.3, context="t", _exit=fired.append).start()
    time.sleep(1.2)
    wd.stop()
    assert fired == [STALL_EXIT_CODE]


def test_quiet_while_petted():
    fired = []
    wd = StallWatchdog(0.4, _exit=fired.append).start()
    for _ in range(10):
        time.sleep(0.1)
        wd.pet()
    wd.stop()
    # and it must not fire after stop() even if we now go idle
    time.sleep(0.8)
    assert fired == []


def test_rejects_nonpositive_timeout():
    with pytest.raises(ValueError):
        StallWatchdog(0)


def test_real_exit_code_in_subprocess():
    """The real os._exit path delivers exactly STALL_EXIT_CODE."""
    code = (
        "import time\n"
        "from semi_tpu.train.watchdog import StallWatchdog\n"
        "StallWatchdog(0.3).start()\n"
        "time.sleep(30)\n"
    )
    rc = subprocess.call([sys.executable, "-c", code], timeout=60, env=_ENV)
    assert rc == STALL_EXIT_CODE


def test_supervisor_force_resume():
    sys.path.insert(0, "tools")
    try:
        from supervise_resume import force_resume
    finally:
        sys.path.pop(0)
    assert force_resume(["python", "t.py", "--resume", "False"]) == \
        ["python", "t.py", "--resume", "True"]
    assert force_resume(["python", "t.py", "--resume=False"]) == \
        ["python", "t.py", "--resume=True"]
    assert force_resume(["python", "t.py"]) == \
        ["python", "t.py", "--resume", "True"]


def test_supervisor_end_to_end(tmp_path):
    """A command that stall-exits once is relaunched with --resume True
    and its clean second exit passes through."""
    script = tmp_path / "flaky.py"
    script.write_text(
        "import os, sys\n"
        "sentinel = sys.argv[1]\n"
        "if not os.path.exists(sentinel):\n"
        "    open(sentinel, 'w').close()\n"
        f"    sys.exit({STALL_EXIT_CODE})\n"
        "assert '--resume' in sys.argv and "
        "sys.argv[sys.argv.index('--resume') + 1] == 'True', sys.argv\n"
        "sys.exit(0)\n")
    rc = subprocess.call(
        [sys.executable, "tools/supervise_resume.py", "--retries", "2", "--",
         sys.executable, str(script), str(tmp_path / "sentinel"),
         "--resume", "False"],
        timeout=120, env=_ENV)
    assert rc == 0


def test_supervisor_passes_other_codes_through(tmp_path):
    rc = subprocess.call(
        [sys.executable, "tools/supervise_resume.py", "--",
         sys.executable, "-c", "import sys; sys.exit(3)"],
        timeout=120, env=_ENV)
    assert rc == 3


def test_processor_with_watchdog_trains_and_stops(tmp_path):
    """config.stall_timeout: the trainer runs under a live watchdog
    (pets keep it quiet) and tears it down at train() exit."""
    from semi_tpu.train.processor import Processor

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["config"]["checkpoint_dir"] = str(tmp_path / "modules")
    cfg["config"]["log_dir"] = str(tmp_path / "log")
    cfg["config"]["stall_timeout"] = 120  # generous: must NOT fire
    path = _write_config(cfg, tmp_path)
    proc = Processor("TemporalCRN", path, user_defined_name="w")
    proc.train(stage=0, resume=False)
    assert proc._watchdog is None  # stopped and cleared
    assert np.isfinite(proc.last_loss)
