#!/bin/bash
# Keep a solve campaign alive across axon-tunnel client wedges.
#
# Long-lived solve clients over the tunnel wedge spontaneously (futex-wait
# on a device response that never arrives) after ~30-60 min / ~150 states
# (observed r3+r4; see docs/RUNBOOK.md round-4 rules). The campaign CLI is
# fully resume-safe (--resume + periodic results.pkl flushes), so the fix
# is operational: watch the log, and when it goes silent too long, kill
# and relaunch.
#
# Usage: babysit_solve.sh <logfile> <done_pattern> <silence_s> -- <cmd...>
#   <cmd...> must include --resume and append to <logfile> itself? No:
#   this script redirects cmd output to <logfile> (append).
# Exits when <done_pattern> appears in the log (campaign completed).
set -u
LOG=$1; DONE_PAT=$2; SILENCE=$3
shift 3
[ "$1" = "--" ] && shift

while true; do
  "$@" >> "$LOG" 2>&1 &
  PID=$!
  echo "$(date -u +%H:%M:%S) babysit: launched pid $PID" >> "$LOG.babysit"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    if grep -q "$DONE_PAT" "$LOG"; then
      break
    fi
    NOW=$(date +%s); MT=$(stat -c %Y "$LOG" 2>/dev/null || echo "$NOW")
    if [ $((NOW - MT)) -gt "$SILENCE" ]; then
      echo "$(date -u +%H:%M:%S) babysit: log silent $((NOW - MT))s; restarting pid $PID" >> "$LOG.babysit"
      kill -TERM "$PID" 2>/dev/null; sleep 5
      kill -KILL "$PID" 2>/dev/null; sleep 3
      break
    fi
  done
  wait "$PID" 2>/dev/null
  if grep -q "$DONE_PAT" "$LOG"; then
    echo "$(date -u +%H:%M:%S) babysit: campaign complete" >> "$LOG.babysit"
    exit 0
  fi
  sleep 5
done
