"""Pause this repo's own background TPU jobs for a clean measurement.

Training/solve campaigns run continuously on the single chip; benchmarks
measure hardware capability, not time-slice share, so our own jobs (exact
PIDs recorded at launch in logs/tpu_jobs.pids) are SIGSTOPped and always
resumed — on normal exit, crash, and SIGTERM/SIGHUP (e.g. `timeout`),
via finally + atexit + signal handlers that raise SystemExit.

A PID is paused only if it still exists, its cwd is this repo root
(derived from this file, not hardcoded), and its cmdline is a python
process running this package (deepcubea_tpu) — a stale pid reused by an
unrelated process is skipped.
"""

import contextlib
import os
import signal
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
PIDFILE = os.path.join(REPO_ROOT, "logs", "tpu_jobs.pids")


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _is_our_job(pid: int) -> bool:
    try:
        if os.readlink(f"/proc/{pid}/cwd") != REPO_ROOT:
            return False
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        return "python" in cmd and "deepcubea_tpu" in cmd
    except OSError:
        return False


@contextlib.contextmanager
def pause_background_jobs(settle_s: float = 5.0):
    try:
        with open(PIDFILE) as f:
            cands = [int(x) for x in f.read().split()]
    except (OSError, ValueError):
        cands = []
    me = os.getpid()
    pids = []
    for p in dict.fromkeys(cands):  # dedup, keep order
        if p == me or not _is_our_job(p):
            continue
        try:
            os.kill(p, signal.SIGSTOP)
            pids.append(p)
        except OSError:
            continue

    prev_handlers = {}
    if pids:
        _log(f"paused background jobs for measurement: {pids}")
        import atexit

        def resume():
            for p in pids:
                try:
                    os.kill(p, signal.SIGCONT)
                except OSError:
                    pass
        atexit.register(resume)

        # default SIGTERM/SIGHUP would skip finally/atexit (ADVICE r2);
        # convert to SystemExit so the resume path runs
        def _die(signum, frame):
            raise SystemExit(128 + signum)
        for sig in (signal.SIGTERM, signal.SIGHUP):
            prev_handlers[sig] = signal.signal(sig, _die)
        time.sleep(settle_s)  # let already-enqueued device programs drain
    try:
        yield
    finally:
        for p in pids:
            try:
                os.kill(p, signal.SIGCONT)
            except OSError:
                pass
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        if pids:
            _log("resumed background jobs")
