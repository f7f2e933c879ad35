"""Cooperative quiesce protocol for sharing the single TPU with benchmarks.

Problem: bench.py used to SIGSTOP background jobs directly. A job stopped
MID-device-program leaves the axon tunnel streaming results to a client
that never reads them — observed round 3 as a whole-device wedge (the
bench's own first compile blocked >25 min with bytes stuck in its socket
Recv-Q, with all jobs in T state).

Protocol: long-running jobs (cli.train, cli.solve) install a SIGUSR1
handler and call `check_quiesce()` at safe points — host-side loop
boundaries right after a blocking device sync, with no dispatch in
flight. On SIGUSR1 the flag is set (CPython defers handlers while the
main thread is blocked inside a native device call, so the flag is only
ever seen at a safe point); check_quiesce() then SIGSTOPs the process
ITSELF. The benchmark (utils/bench_pause.py) sends SIGUSR1, waits for
state T, measures, then SIGCONTs — the job resumes exactly where it
paused, with the device queue empty the whole time.
"""

import os
import signal

_flag = {"quiesce": False}

#: the benchmark writes its pid here for the duration of the pause window
#: (bench_pause.py); removed before jobs are resumed
REQUESTER_FILE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "logs", "quiesce_requester.pid")


def _on_sigusr1(signum, frame):
    _flag["quiesce"] = True


def install_quiesce_handler() -> None:
    """Call once at CLI startup (main thread)."""
    signal.signal(signal.SIGUSR1, _on_sigusr1)


def _requester_active() -> bool:
    """True iff a benchmark's pause window is still open: its pid file
    exists and that process is alive. Guards against the stale-flag race
    (observed round 3): a SIGUSR1 delivered while the main thread was deep
    in a device call could be consumed at a safe point AFTER the benchmark
    had already given up waiting (300s deadline), SIGSTOPped directly,
    measured, and resumed everyone -- the late self-SIGSTOP then had no
    one left to SIGCONT it, stalling four trainers indefinitely."""
    try:
        with open(REQUESTER_FILE) as f:
            pid = int(f.read().strip())
        os.kill(pid, 0)
        return True
    except (OSError, ValueError):
        return False


def check_quiesce() -> None:
    """Call at safe points (no device work in flight). If a quiesce was
    requested and its requester still holds the pause window open, stop
    HERE until SIGCONT."""
    if _flag["quiesce"]:
        _flag["quiesce"] = False
        if _requester_active():
            os.kill(os.getpid(), signal.SIGSTOP)
