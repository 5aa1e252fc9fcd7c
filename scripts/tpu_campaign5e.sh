#!/bin/bash
# Round-5 final tail (campaign 5e). The 2026-08-20 ~01:56 VM restart wiped
# data/ + cases/ + logs5/ again before campaign 5d's queue ran, so this
# re-queues it with one structural change: every dataset build is hoisted
# into a concurrent nice'd CPU job (scripts/prep_round5e.sh) so the TPU
# legs never serialize behind the 1-core builder. Queue order = remaining
# evidence value (VERDICT r4 items 6, 5, 4, 3-bonus):
#
#   1. kernel isolation + vmem64/115 reruns (item 6; 4t numbers lost in /tmp)
#   2. bench --bf16res (hardware-gate the 4.37 ms shipping candidate)
#   3. clean-protocol multi-view selection (item 5)
#   4. contrast-curve re-train, 6 arms (item 4)
#   5. wd/TV repair arms at 0.18, flagship-contrast 200k (time-permitting)
#
# Usage: setsid bash scripts/tpu_campaign5e.sh &
echo $$ > /tmp/tpu_campaign5e.pid
cd /root/repo || exit 1
TAG=5e
mkdir -p logs5
L=/root/repo/logs5/campaign5e.log
source scripts/campaign_lib.sh

note "=== campaign 5e start ==="

run_job isolation5e 3600 python scripts/tpu_kernel_isolation.py
run_job vmem64_5e 1800 python scripts/tpu_kernel_sweep.py --fused --vmem 64 4096
run_job vmem115_5e 1800 python scripts/tpu_kernel_sweep.py --fused --vmem 115 4096

run_job bench_bf16 3600 python bench.py --bf16res
# bench prints its gated JSON rows to stdout only; mirror them into the
# committed tree so the bf16res hardware certification survives a wipe
grep '"metric"' /tmp/q_bench_bf16.log > artifacts/round5/bench_bf16res.jsonl 2>/dev/null
note "bench_bf16 rows: $(tail -1 artifacts/round5/bench_bf16res.jsonl 2>/dev/null | cut -c1-200)"

if [ ! -f artifacts/round5/clean_protocol_multisel.json ]; then
  run_job cleansel2 9000 python scripts/tpu_clean_protocol.py \
    --selection "0,0;75,0;0,-35"
fi

run_job sweep5e 21600 python scripts/tpu_contrast_sweep.py 6000 \
  --arms 2.4,1.6,1.2,0.8,0.5,0.35

run_job repair_wd 14400 python scripts/tpu_contrast_repair.py 6000 \
  --lca 0.18 --arms wd3,tv7,tv_wd_longwin

run_job longsched24 10800 python scripts/tpu_longsched.py 200000 --lca 2.4

note "=== CAMPAIGN 5E DONE ==="
