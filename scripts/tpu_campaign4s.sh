#!/bin/bash
# Round-4s: follow-on to 4r — the XCAT-surrogate TPU train (stage 3 of
# scripts/tpu_xcat_surrogate.py; stages 1-2 are CPU and pre-built by
# prep_round4r.py), closing the last "partial" component leg, then a
# sweep over anything 4r left unfinished (every campaign job is
# idempotent: ledgers have resume semantics, datasets skip-if-exist).
#
# Usage: setsid bash scripts/tpu_campaign4s.sh <wait_pid> &
echo $$ > /tmp/tpu_campaign4s.pid
cd /root/repo || exit 1
L=/tmp/tpu_campaign.log
STALL=900
WAIT_PID=${1:-}

note() { echo "$(date +%H:%M:%S) [4s] $*" >> "$L"; }

kill_tree() {
  local pid=$1 kids
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  kill "$pid" $kids 2>/dev/null
  sleep 10
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  kill -9 "$pid" $kids 2>/dev/null
}

run_job() {
  local name=$1 tmo=$2; shift 2
  local log=/tmp/q_${name}.log
  local attempt rc stalled jpid age
  for attempt in 1 2; do
    note "job $name attempt $attempt: $*"
    : > "$log"
    timeout "$tmo" "$@" >> "$log" 2>&1 &
    jpid=$!
    echo "$jpid" > "/tmp/q_${name}.pid"
    stalled=0
    while kill -0 "$jpid" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
      if [ "$age" -gt "$STALL" ]; then
        note "job $name WEDGED (log quiet ${age}s) — killing $jpid"
        kill_tree "$jpid"
        stalled=1
        break
      fi
    done
    wait "$jpid" 2>/dev/null; rc=$?
    if [ "$stalled" -eq 1 ]; then
      note "job $name attempt $attempt wedged; retrying"
      continue
    fi
    note "job $name rc=$rc; tail: $(tail -1 "$log" | cut -c1-200)"
    [ "$rc" -eq 0 ] && return 0
  done
  note "job $name GAVE UP after 2 attempts"
  return 1
}

if [ -n "$WAIT_PID" ]; then
  note "waiting for 4r supervisor pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
note "=== campaign 4s start ==="

run_job xcat 9000 python scripts/tpu_xcat_surrogate.py 6000
run_job contrast_all 21600 python scripts/tpu_contrast_sweep.py 6000
run_job repair2 21600 python scripts/tpu_contrast_repair.py 6000

note "=== CAMPAIGN 4S DONE ==="
