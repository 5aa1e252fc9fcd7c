#!/bin/bash
# Round-4t: replaces the 4r/4s supervisors (killed) to insert the short
# sharded-fused real-Mosaic gate (closes VERDICT r3 weak #6 on hardware)
# ahead of the long quality runs. Adopts the already-running contrast018
# job (watchdog only, no restart — the contrast_all job later retries any
# missing arm via the ledger's resume semantics), then runs the full
# re-ordered queue.
#
# Usage: setsid bash scripts/tpu_campaign4t.sh &
echo $$ > /tmp/tpu_campaign4t.pid
cd /root/repo || exit 1
L=/tmp/tpu_campaign.log
STALL=900

note() { echo "$(date +%H:%M:%S) [4t] $*" >> "$L"; }

kill_tree() {
  local pid=$1 kids
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  kill "$pid" $kids 2>/dev/null
  sleep 10
  kids=$(ps -o pid= --ppid "$pid" 2>/dev/null)
  kill -9 "$pid" $kids 2>/dev/null
}

watch_pid() {
  # watchdog an existing job: wait for it, stall-kill if its log wedges
  local jpid=$1 log=$2 age
  while kill -0 "$jpid" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$log" 2>/dev/null || echo 0) ))
    if [ "$age" -gt "$STALL" ]; then
      note "adopted job WEDGED (log quiet ${age}s) — killing $jpid"
      kill_tree "$jpid"
      return 1
    fi
  done
  return 0
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

note "=== campaign 4t start ==="
if [ -f /tmp/q_contrast018.pid ] && kill -0 "$(cat /tmp/q_contrast018.pid)" 2>/dev/null; then
  note "adopting running contrast018 job pid $(cat /tmp/q_contrast018.pid)"
  watch_pid "$(cat /tmp/q_contrast018.pid)" /tmp/q_contrast018.log
  note "contrast018 finished; tail: $(tail -1 /tmp/q_contrast018.log | cut -c1-200)"
fi

run_job sharded_gate 3600 python scripts/tpu_sharded_gate.py
run_job presets      9000 python scripts/tpu_preset_views.py 6000
run_job ccta         9000 python scripts/tpu_ccta_surrogate.py 6000
run_job xcat         9000 python scripts/tpu_xcat_surrogate.py 6000
run_job contrastmid  9000 python scripts/tpu_contrast_sweep.py 6000 --arms 1.2,0.5
run_job bench_bf16res 3600 python bench.py --bf16res
run_job contrastrest 12000 python scripts/tpu_contrast_sweep.py 6000 --arms 2.4,1.6,0.8,0.35
run_job isolation 3600 python scripts/tpu_kernel_isolation.py
run_job vmem64   1800 python scripts/tpu_kernel_sweep.py --fused --vmem 64 4096
run_job vmem115  1800 python scripts/tpu_kernel_sweep.py --fused --vmem 115 4096
run_job contrast_all 21600 python scripts/tpu_contrast_sweep.py 6000
run_job repair 21600 python scripts/tpu_contrast_repair.py 6000

note "=== CAMPAIGN 4T DONE ==="
