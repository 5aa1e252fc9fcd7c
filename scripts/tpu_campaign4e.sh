#!/bin/bash
# Round-4e: certify the bf16-residual bench config on hardware (gate +
# timing at the exact shipped tile). If kernel_check is ok and the number
# beats the f32-residual capture, the default flips before round end.
#
# Usage: setsid bash scripts/tpu_campaign4e.sh <wait_pid> &
echo $$ > /tmp/tpu_campaign4e.pid
cd /root/repo || exit 1
L=/tmp/tpu_campaign.log
STALL=900
WAIT_PID=${1:-}

note() { echo "$(date +%H:%M:%S) [4e] $*" >> "$L"; }

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
  note "waiting for 4d supervisor pid $WAIT_PID"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
fi
note "=== campaign 4e start ==="

run_job bench_bf16res 3600 python bench.py --bf16res

note "=== CAMPAIGN 4E DONE ==="
