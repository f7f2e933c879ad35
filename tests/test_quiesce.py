"""Cooperative quiesce protocol (utils/quiesce.py + utils/bench_pause.py):
a job SIGSTOPs itself at a safe point after SIGUSR1 — but only while the
requesting benchmark's pause window is open (requester pid file names a
live process). A stale SIGUSR1 consumed after the window closes must be
ignored (the round-3 stall: four trainers self-stopped after the bench had
already resumed everyone, with nobody left to SIGCONT them)."""

import os
import signal
import subprocess
import sys
import time

from deepcubea_tpu.utils.quiesce import REQUESTER_FILE

CHILD = """
import sys, time
from deepcubea_tpu.utils.quiesce import install_quiesce_handler, check_quiesce
install_quiesce_handler()
print("ready", flush=True)
for _ in range(3000):
    time.sleep(0.01)
    check_quiesce()
print("done", flush=True)
"""


def _state(pid):
    with open(f"/proc/{pid}/stat") as f:
        return f.read().split(") ", 1)[1].split(" ", 1)[0]


def _spawn():
    p = subprocess.Popen([sys.executable, "-c", CHILD],
                         stdout=subprocess.PIPE, text=True)
    assert p.stdout.readline().strip() == "ready"
    return p


def _open_window():
    os.makedirs(os.path.dirname(REQUESTER_FILE), exist_ok=True)
    with open(REQUESTER_FILE, "w") as f:
        f.write(str(os.getpid()))


def _close_window():
    try:
        os.remove(REQUESTER_FILE)
    except OSError:
        pass


def test_quiesce_stop_and_resume():
    p = _spawn()
    try:
        _open_window()
        os.kill(p.pid, signal.SIGUSR1)
        deadline = time.time() + 10
        while _state(p.pid) != "T":
            assert time.time() < deadline, "child did not quiesce"
            time.sleep(0.05)
        # stays stopped
        time.sleep(0.3)
        assert _state(p.pid) == "T"
        os.kill(p.pid, signal.SIGCONT)
        deadline = time.time() + 10
        while _state(p.pid) == "T":
            assert time.time() < deadline, "child did not resume"
            time.sleep(0.05)
        p.terminate()
    finally:
        _close_window()
        p.kill()
        p.wait()


def test_stale_quiesce_ignored_when_window_closed():
    """SIGUSR1 with no open pause window (file absent, or requester dead)
    must NOT self-stop the job."""
    p = _spawn()
    try:
        _close_window()
        os.kill(p.pid, signal.SIGUSR1)
        time.sleep(1.0)
        assert _state(p.pid) != "T", "child stopped on a stale quiesce"

        # window file naming a dead pid: also stale
        os.makedirs(os.path.dirname(REQUESTER_FILE), exist_ok=True)
        with open(REQUESTER_FILE, "w") as f:
            f.write("999999999")
        os.kill(p.pid, signal.SIGUSR1)
        time.sleep(1.0)
        assert _state(p.pid) != "T", "child stopped for a dead requester"
        p.terminate()
    finally:
        _close_window()
        p.kill()
        p.wait()
