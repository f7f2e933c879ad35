"""Cooperative quiesce protocol (utils/quiesce.py + utils/bench_pause.py):
a job SIGSTOPs itself at a safe point after SIGUSR1 and resumes on SIGCONT."""

import os
import signal
import subprocess
import sys
import time

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


def test_quiesce_stop_and_resume():
    p = subprocess.Popen([sys.executable, "-c", CHILD],
                         stdout=subprocess.PIPE, text=True)
    try:
        assert p.stdout.readline().strip() == "ready"
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
        p.kill()
        p.wait()
