#!/usr/bin/env python
"""Supervised launcher: auto-resume a training CLI after stall exits.

Failure recovery for relay/device wedges (SURVEY §5.3): the trainers'
StallWatchdog (semi_tpu/train/watchdog.py) exits with code 42 when a
device call never returns. This wrapper relaunches the SAME command
with ``--resume True`` forced, so the run continues from the last
(mid-epoch) checkpoint. Any other exit code passes through untouched —
crashes and clean exits are not retried.

Usage:
    python tools/supervise_resume.py [--retries N] -- <command...>
e.g.
    python tools/supervise_resume.py --retries 3 -- \
        python train_fullsubnet.py ./config_fullsubnet.yaml \
        --user_defined_name fsn_r3 --resume True

Runs as a plain wrapper (no TPU claim of its own: subprocesses own the
tunnel); safe to use in chain scripts.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

STALL_EXIT_CODE = 42  # keep in sync with semi_tpu.train.watchdog


def force_resume(cmd: list[str]) -> list[str]:
    """Return cmd with ``--resume True`` forced (replace or append)."""
    out = list(cmd)
    for i, a in enumerate(out):
        if a == "--resume" and i + 1 < len(out):
            out[i + 1] = "True"
            return out
        if a.startswith("--resume="):
            out[i] = "--resume=True"
            return out
    return out + ["--resume", "True"]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--retries", type=int, default=3,
                    help="max relaunches after stall exits (default 3)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the command to supervise")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (separate it with --)")

    attempt = 0
    while True:
        t0 = time.monotonic()
        rc = subprocess.call(cmd)
        if rc != STALL_EXIT_CODE:
            return rc
        attempt += 1
        if attempt > args.retries:
            print(f"supervise_resume: stall exit {STALL_EXIT_CODE} again "
                  f"after {args.retries} retries — giving up", flush=True)
            return rc
        print(f"supervise_resume: stall exit after "
              f"{time.monotonic() - t0:.0f}s — relaunching with --resume "
              f"True (attempt {attempt}/{args.retries})", flush=True)
        cmd = force_resume(cmd)


if __name__ == "__main__":
    sys.exit(main())
