"""Pause this repo's own background TPU jobs for a clean measurement.

Training/solve campaigns run continuously on the single chip; benchmarks
measure hardware capability, not time-slice share. Jobs are paused via
the cooperative quiesce protocol (utils/quiesce.py): each job gets
SIGUSR1, finishes its in-flight device program, and SIGSTOPs itself at a
safe point — never mid-stream, which wedges the axon tunnel for every
client (observed round 3). Jobs that do not reach state T within
`quiesce_deadline_s` (e.g. one long fused chunk) are SIGSTOPped directly
as a fallback. Everything is always resumed — on normal exit, crash, and
SIGTERM/SIGHUP (e.g. `timeout`), via finally + atexit + signal handlers;
a watchdog thread additionally force-resumes and aborts the process if
the measurement itself exceeds `watchdog_s` (a wedged device call blocks
the main thread in native code where Python signal handlers cannot run).

A PID is touched only if it still exists, its cwd is this repo root
(derived from this file, not hardcoded), and its cmdline is a python
process running this package (deepcubea_tpu) — a stale pid reused by an
unrelated process is skipped.
"""

import contextlib
import os
import signal
import sys
import threading
import time

from .quiesce import REQUESTER_FILE

REPO_ROOT = os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))))
PIDFILE = os.path.join(REPO_ROOT, "logs", "tpu_jobs.pids")


def _open_pause_window():
    """Publish this process as the active quiesce requester. check_quiesce
    self-stops ONLY while this file names a live process — a SIGUSR1
    consumed after the window closes is ignored instead of self-stopping
    with nobody left to SIGCONT (the round-3 four-trainer stall)."""
    try:
        with open(REQUESTER_FILE, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass


def _close_pause_window():
    try:
        os.remove(REQUESTER_FILE)
    except OSError:
        pass


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def _is_our_job(pid: int) -> bool:
    try:
        if os.readlink(f"/proc/{pid}/cwd") != REPO_ROOT:
            return False
        with open(f"/proc/{pid}/cmdline", "rb") as f:
            cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        # scripts/resolve_residue.py drives cli.solve in-process, so its
        # cmdline lacks the package name — without this clause residue
        # jobs silently kept running through r5's sokoban slice and
        # confounded it
        return "python" in cmd and ("deepcubea_tpu" in cmd
                                    or "resolve_residue" in cmd)
    except OSError:
        return False


def _state(pid: int) -> str:
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().split(") ", 1)[1].split(" ", 1)[0]
    except OSError:
        return "X"


def _resume(pids):
    for p in pids:
        try:
            os.kill(p, signal.SIGCONT)
        except OSError:
            pass


@contextlib.contextmanager
def pause_background_jobs(quiesce_deadline_s: float = 300.0,
                          watchdog_s: float = 1200.0):
    try:
        with open(PIDFILE) as f:
            cands = [int(x) for x in f.read().split()]
    except (OSError, ValueError):
        cands = []
    me = os.getpid()
    jobs = [p for p in dict.fromkeys(cands) if p != me and _is_our_job(p)]

    paused = []
    prev_handlers = {}
    watchdog_stop = threading.Event()
    if jobs:
        # ask jobs to quiesce at their next safe point
        _open_pause_window()
        for p in jobs:
            try:
                os.kill(p, signal.SIGUSR1)
            except OSError:
                continue
        t0 = time.time()
        pending = set(jobs)
        while pending and time.time() - t0 < quiesce_deadline_s:
            for p in list(pending):
                st = _state(p)
                if st == "T":
                    paused.append(p)
                    pending.discard(p)
                elif st == "X" or not os.path.exists(f"/proc/{p}"):
                    pending.discard(p)
            if pending:
                time.sleep(2.0)
        for p in sorted(pending):  # fallback: direct stop (pre-quiesce jobs)
            try:
                os.kill(p, signal.SIGSTOP)
                paused.append(p)
                _log(f"pid {p} did not quiesce in {quiesce_deadline_s:.0f}s; "
                     f"SIGSTOPped directly")
            except OSError:
                pass
        _log(f"paused background jobs for measurement: {sorted(paused)}")

        import atexit
        atexit.register(_resume, paused)

        # default SIGTERM/SIGHUP would skip finally/atexit; convert to
        # SystemExit so the resume path runs (only reachable while the
        # main thread is in Python code)
        def _die(signum, frame):
            raise SystemExit(128 + signum)
        for sig in (signal.SIGTERM, signal.SIGHUP):
            prev_handlers[sig] = signal.signal(sig, _die)

        # last resort for a main thread wedged in a native device call:
        # resume everything and hard-exit
        def _watchdog():
            if not watchdog_stop.wait(watchdog_s):
                _log(f"bench watchdog fired after {watchdog_s:.0f}s: "
                     f"resuming jobs and aborting")
                _close_pause_window()
                _resume(paused)
                os._exit(3)
        threading.Thread(target=_watchdog, daemon=True).start()
        time.sleep(2.0)  # let the tunnel settle
    try:
        yield
    finally:
        watchdog_stop.set()
        _close_pause_window()   # before SIGCONT: no self-stop after resume
        # Resume EVERY job in the pidfile, not just the ones we SIGSTOPped:
        # check_quiesce's requester-alive check and its self-SIGSTOP are not
        # atomic, so a job can still self-stop in the microsecond after the
        # window closes. A second CONT sweep after a short delay wakes any
        # such straggler (ADVICE r3).
        _resume(dict.fromkeys(list(paused) + jobs))
        time.sleep(0.5)
        _resume(dict.fromkeys(list(paused) + jobs))
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        if paused:
            _log("resumed background jobs")
