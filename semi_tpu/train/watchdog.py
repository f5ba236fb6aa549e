"""Stall watchdog: failure detection for relay/device hangs.

SURVEY §5.3 (failure detection/recovery). The observed production
failure mode on this stack is NOT a crash: a device call whose
response is lost in the relay blocks the step loop forever (all
threads parked on futexes, zero CPU — seen live during the round-3
FullSubNet deepening run: 27 min without a step before manual
intervention). A deadline thread converts that silent wedge into a
loud, machine-recognizable exit so a supervisor can relaunch with
``--resume True`` and continue from the mid-epoch checkpoint
(``ckpt_every_steps`` bounds the lost work).

Design notes:
- The step loop ``pet()``s the watchdog once per iteration (a
  monotonic-clock store, no locks, no syscalls) — every iteration
  ends in a host sync (``float(metrics)``), which is exactly the
  call that wedges.
- On expiry the watchdog CANNOT unwind the main thread (it is
  blocked inside a C extension waiting on the relay socket), so it
  prints a diagnostic and hard-exits via ``os._exit`` with
  ``STALL_EXIT_CODE``. Buffered checkpoint state is safe: saves are
  atomic (tmp + os.replace) and the async writer queue either landed
  a file completely or not at all.
- The timeout must cover LEGITIMATE long gaps: XLA compiles on this
  backend take 1-4 min and corpus upload takes ~1 min, so the default
  is deliberately generous (15 min) and configurable per run via
  ``config.stall_timeout`` (seconds; 0/absent disables).

Reference analog: the reference has no equivalent (its NCCL runs die
loudly); this subsystem exists because a relay-attached TPU fails
*quietly*.
"""

from __future__ import annotations

import os
import sys
import threading
import time

__all__ = ["StallWatchdog", "STALL_EXIT_CODE"]

# Distinct from Python's 1 (exception) and 2 (usage): supervisors key
# retry-with-resume on exactly this code.
STALL_EXIT_CODE = 42


class StallWatchdog:
    """Deadline thread that hard-exits the process on step-loop stalls.

    Usage::

        wd = StallWatchdog(timeout_s=900, context="train")
        wd.start()
        try:
            for ...:
                wd.pet()
                ... device call + host sync ...
        finally:
            wd.stop()
    """

    def __init__(self, timeout_s: float, context: str = "",
                 _exit=os._exit) -> None:
        if timeout_s <= 0:
            raise ValueError("timeout_s must be positive (omit the "
                             "watchdog to disable it)")
        self.timeout_s = float(timeout_s)
        self.context = context
        self._exit = _exit  # injectable for tests
        self._last = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def pet(self) -> None:
        self._last = time.monotonic()

    def start(self) -> "StallWatchdog":
        if self._thread is not None:
            return self
        self.pet()
        self._thread = threading.Thread(
            target=self._watch, name="stall-watchdog", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None

    # -- internals --------------------------------------------------
    def _watch(self) -> None:
        # poll at timeout/8 (bounded to [1s, 30s]): fine-grained enough
        # that expiry detection adds at most ~12% to the configured
        # timeout, coarse enough to cost nothing
        poll = min(30.0, max(0.1, self.timeout_s / 8.0))
        while not self._stop.wait(poll):
            idle = time.monotonic() - self._last
            if idle >= self.timeout_s:
                print(
                    f"STALL WATCHDOG: no step-loop progress for "
                    f"{idle:.0f}s (limit {self.timeout_s:.0f}s)"
                    f"{' in ' + self.context if self.context else ''}; "
                    f"the device link is presumed wedged. Exiting "
                    f"{STALL_EXIT_CODE} for supervised resume "
                    f"(tools/supervise_resume.py).",
                    file=sys.stderr, flush=True)
                try:
                    sys.stderr.flush()
                    sys.stdout.flush()
                except Exception:
                    pass
                self._exit(STALL_EXIT_CODE)
                return  # only reached with an injected _exit (tests)
