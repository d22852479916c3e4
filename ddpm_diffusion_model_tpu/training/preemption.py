"""Preemption-safe training: SIGTERM/SIGINT → finish the in-flight step,
save an emergency checkpoint, return cleanly.

TPU pods (and spot/preemptible VMs generally) are routinely reclaimed with
a SIGTERM and a short grace window.  The reference has no equivalent — a
Colab disconnect loses everything since the last periodic save
(``main_train_loop.py:208-216``).  Here ``train_ddpm`` installs these
handlers by default: the flag is checked at every batch boundary of the
host loop (the compiled step itself is never interrupted — XLA programs are
atomic), the state is flushed to ``<run_name>_preempt``, and the loop
returns with ``summary["preempted"] = True`` so callers/schedulers can
relaunch with ``resume_path="auto"``.
"""

from __future__ import annotations

import signal
import threading
from contextlib import contextmanager

__all__ = ["PreemptionFlag", "catch_preemption"]


class PreemptionFlag:
    """Truthiness = "a stop was requested".  Usable directly as a signal
    handler; also trippable manually (tests, cooperative shutdown)."""

    def __init__(self):
        self.triggered = False
        self.signum = None

    def __call__(self, signum=None, frame=None):
        self.triggered = True
        self.signum = signum

    def __bool__(self) -> bool:
        return self.triggered


@contextmanager
def catch_preemption(signals=(signal.SIGTERM, signal.SIGINT)):
    """Yield a :class:`PreemptionFlag` that trips when any of ``signals``
    arrives; previous handlers are restored on exit.  Outside the main
    thread (where CPython forbids ``signal.signal``) the flag is yielded
    un-installed — it can still be tripped manually."""
    flag = PreemptionFlag()
    installed = {}
    if threading.current_thread() is threading.main_thread():
        for s in signals:
            installed[s] = signal.signal(s, flag)
    try:
        yield flag
    finally:
        for s, old in installed.items():
            signal.signal(s, old)
