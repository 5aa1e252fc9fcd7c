#!/bin/bash
# Round-5 reordered tail (campaign 5d). Supersedes the tail of 5c: with
# VERDICT item 3 already cracked by the 200k pacing run, the 7-point
# contrast curve (item 4, sweep) outranks the 4h repair-arm leg, so the
# queue is reordered by remaining evidence value:
#
#   0. adopt the in-flight cleansel job (item 5)
#   1. kernel isolation + vmem64 (item 6)
#   2. bench certification
#   3. contrast-curve re-train, 6 arms (item 4)
#   4. wd/TV repair arms at 0.18 (item 3 bonus)
#   5. vmem115 rerun, flagship-contrast 200k (time-permitting)
#
# Usage: setsid bash scripts/tpu_campaign5d.sh &
echo $$ > /tmp/tpu_campaign5d.pid
cd /root/repo || exit 1
TAG=5d
L=/root/repo/logs5/campaign5d.log
source scripts/campaign_lib.sh

note "=== campaign 5d start ==="

# --- 0: the in-flight cleansel job started by campaign 5c ---
CS=$(cat /tmp/q_cleansel.pid 2>/dev/null)
if [ -n "$CS" ] && pid_matches "$CS" tpu_clean_protocol; then
  note "adopting cleansel pid $CS"
  # restart the staleness clock; remote compiles are log-quiet ~10 min
  touch -c /tmp/q_cleansel.log
  STALL=1200
  if watch_pid "$CS" /tmp/q_cleansel.log; then
    note "cleansel exited"
  else
    note "cleansel wedged and was killed"
  fi
  STALL=900
fi
if [ ! -f artifacts/round5/clean_protocol_multisel.json ]; then
  run_job cleansel2 9000 python scripts/tpu_clean_protocol.py \
    --selection "0,0;75,0;0,-35"
fi

run_job isolation5d 3600 python scripts/tpu_kernel_isolation.py
run_job vmem64_5d 1800 python scripts/tpu_kernel_sweep.py --fused --vmem 64 4096

run_job bench5d 3600 python bench.py

run_job sweep5d 21600 python scripts/tpu_contrast_sweep.py 6000 \
  --arms 2.4,1.6,1.2,0.8,0.5,0.35

run_job repair_wd 14400 python scripts/tpu_contrast_repair.py 6000 \
  --lca 0.18 --arms wd3,tv7,tv_wd_longwin

run_job vmem115_5d 1800 python scripts/tpu_kernel_sweep.py --fused --vmem 115 4096

run_job longsched24 10800 python scripts/tpu_longsched.py 200000 --lca 2.4

note "=== CAMPAIGN 5D DONE ==="
