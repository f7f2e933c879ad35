#!/bin/bash
# Regenerate logs/tpu_jobs.pids from live python deepcubea_tpu processes.
# Babysitter restarts change job PIDs, so the pidfile written at launch
# time goes stale; bench.py's pause_background_jobs only touches PIDs it
# can verify, so a stale file silently pauses nothing. Run this right
# before any bench/probe that needs the chip quiet.
cd "$(dirname "$0")/.." || exit 1
ps -eo pid,cmd | awk '$2 ~ /^python[3]?$/ && ($0 ~ /deepcubea_tpu/ || $0 ~ /resolve_residue/) {print $1}' > logs/tpu_jobs.pids
echo "tpu_jobs.pids:"; cat logs/tpu_jobs.pids
