#!/bin/bash
# Round-4 TPU campaign supervisor: one serial queue with wedge detection.
#
# The axon tunnel's known failure mode is a mid-run WEDGE (process alive,
# log stalled; see CLAUDE.md).  The old 4-stage queue chain ran every job
# under a bare `timeout`, so a wedge burned the job's whole budget (up to
# 3 h).  This supervisor watches each job's log mtime and kills + retries
# (once) any job quiet for >15 min, re-probing TPU liveness in between.
#
# Usage: setsid bash scripts/tpu_campaign.sh &   (PID in /tmp/tpu_campaign.pid)
# Kill by PID only — never by pattern.
echo $$ > /tmp/tpu_campaign.pid
cd /root/repo || exit 1
L=/tmp/tpu_campaign.log
STALL=900

note() { echo "$(date +%H:%M:%S) $*" >> "$L"; }

wait_alive() {
  while [ ! -f /tmp/tpu_alive ] || ! grep -q ALIVE /tmp/tpu_alive; do
    sleep 60
  done
}

reprobe() {
  rm -f /tmp/tpu_alive
  setsid bash scripts/tpu_probe.sh 300 600 </dev/null >/dev/null 2>&1 &
  wait_alive
  sleep 120   # grace: let the prober's claim drain before the next job
}

kill_tree() {  # kill a timeout wrapper and its children, politely then hard
  local pid=$1
  local kids
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  kill "$pid" $kids 2>/dev/null
  sleep 10
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  kill -9 "$pid" $kids 2>/dev/null
}

run_job() {  # run_job <name> <timeout_s> <cmd...>
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
      note "job $name attempt $attempt wedged; re-probing TPU"
      reprobe
      continue
    fi
    note "job $name rc=$rc; tail: $(tail -1 "$log" | cut -c1-200)"
    [ "$rc" -eq 0 ] && return 0
    if [ "$attempt" -eq 1 ]; then
      note "job $name failed; re-probing TPU then retrying once"
      reprobe
      continue
    fi
  done
  note "job $name GAVE UP after 2 attempts"
  return 1
}

note "=== campaign start; waiting for TPU ==="
wait_alive
sleep 120
note "=== TPU alive; running round-4 jobs ==="

run_job bench    4500 python bench.py
run_job clean    7200 python scripts/tpu_clean_protocol.py
run_job contrast 10800 python scripts/tpu_contrast_sweep.py 6000
run_job presets  5400 python scripts/tpu_preset_views.py 6000
run_job ccta     7200 python scripts/tpu_ccta_surrogate.py 6000
run_job sweep    7200 python scripts/tpu_kernel_sweep.py --fused --vmem 100 --bf16res 4096 8192 16384
run_job profile  3600 python scripts/tpu_profile_step.py 4096 100
run_job sharded  3600 python scripts/tpu_sharded_gate.py
run_job xcat     7200 python scripts/tpu_xcat_surrogate.py 6000

note "=== CAMPAIGN DONE ==="
