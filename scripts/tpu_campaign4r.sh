#!/bin/bash
# Round-4r: resume campaign after a VM restart killed the 4b/4c/4d/4e
# chain. Re-runs every still-missing TPU leg, ordered by evidence value:
#   1. contrast arm lca=0.18 — the XCAT-like regime (vessel iso-intense
#      with tissue), the single most probative point of VERDICT item 2
#   2. 2/3-view preset demos (VERDICT item 5, pending since round 2)
#   3. CCTA surrogate end-to-end (VERDICT item 6)
#   4. remaining contrast arms (ledger has resume semantics)
#   5. bf16-residual bench certification (flips the default if it gates ok)
#   6. kernel attribution + scoped-VMEM sweep (item 4c)
#   7. contrast-repair arms at the sweep-located failure threshold
# Every job's ledger is incremental, so a mid-job kill loses at most the
# current arm, never the campaign.
#
# Usage: setsid bash scripts/tpu_campaign4r.sh &
echo $$ > /tmp/tpu_campaign4r.pid
cd /root/repo || exit 1
L=/tmp/tpu_campaign.log
STALL=900

note() { echo "$(date +%H:%M:%S) [4r] $*" >> "$L"; }

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

note "=== campaign 4r start ==="

run_job contrast018 7200 python scripts/tpu_contrast_sweep.py 6000 --arms 0.18
run_job presets     9000 python scripts/tpu_preset_views.py 6000
run_job ccta        9000 python scripts/tpu_ccta_surrogate.py 6000
run_job contrastmid 9000 python scripts/tpu_contrast_sweep.py 6000 --arms 1.2,0.5
run_job bench_bf16res 3600 python bench.py --bf16res
run_job contrastrest 12000 python scripts/tpu_contrast_sweep.py 6000 --arms 2.4,1.6,0.8,0.35
run_job isolation 3600 python scripts/tpu_kernel_isolation.py
run_job vmem64   1800 python scripts/tpu_kernel_sweep.py --fused --vmem 64 4096
run_job vmem115  1800 python scripts/tpu_kernel_sweep.py --fused --vmem 115 4096
run_job repair 21600 python scripts/tpu_contrast_repair.py 6000

note "=== CAMPAIGN 4R DONE ==="
