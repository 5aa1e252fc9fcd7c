#!/bin/bash
# Round-4b TPU campaign: the jobs still pending after the mid-round reboot
# (bench + clean-protocol already landed; see ROUND4.md items 1/3/8).
# Dataset-free kernel jobs run first so CPU dataset prep can finish in
# parallel (scripts/prep_round4_datasets.py). Same wedge-watchdog semantics
# as tpu_campaign.sh.
#
# Usage: setsid bash scripts/tpu_campaign4b.sh &   (PID in /tmp/tpu_campaign.pid)
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
  sleep 120
}

kill_tree() {
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

wait_file() {  # wait_file <path> <max_s>: block until a prep artifact exists
  local path=$1 max=$2 t=0
  while [ ! -e "$path" ] && [ "$t" -lt "$max" ]; do
    sleep 60; t=$((t + 60))
  done
  [ -e "$path" ] && note "prep artifact ready: $path" \
                 || note "prep artifact TIMED OUT: $path (running anyway)"
}

note "=== campaign 4b start; waiting for TPU ==="
wait_alive
note "=== TPU alive; running round-4b jobs ==="

# Dataset-free kernel jobs first (prep runs concurrently on CPU).
run_job sweep    7200 python scripts/tpu_kernel_sweep.py --fused --vmem 100 --bf16res 4096 8192 16384
run_job profile  3600 python scripts/tpu_profile_step.py 4096 100
run_job sharded  3600 python scripts/tpu_sharded_gate.py

# Dataset-dependent jobs (each script is skip-if-exists on its dataset,
# so even if prep hasn't reached it yet the job builds what it needs).
run_job contrast 14400 python scripts/tpu_contrast_sweep.py 6000
run_job presets  7200 python scripts/tpu_preset_views.py 6000
run_job ccta     7200 python scripts/tpu_ccta_surrogate.py 6000
run_job xcat     7200 python scripts/tpu_xcat_surrogate.py 6000

note "=== CAMPAIGN 4B DONE ==="
