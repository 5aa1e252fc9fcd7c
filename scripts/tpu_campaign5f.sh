#!/bin/bash
# Campaign 5f: supersedes the tail of 5e after its kernel legs landed.
# New facts from 5e: vmem64 4.651 ms ~= vmem115 4.660 ms ~= vmem100 4.679
# (double-buffer depth is NOT a lever; VPU-bound confirmed), and kernel
# isolation pins fwd+bwd f32 at 4.41 ms = 94% of the step. Remaining
# kernel question is one combined point (bf16res + vmem64); everything
# else is the 5e quality tail unchanged.
#
# Usage: setsid bash scripts/tpu_campaign5f.sh &
echo $$ > /tmp/tpu_campaign5f.pid
cd /root/repo || exit 1
TAG=5f
mkdir -p logs5
L=/root/repo/logs5/campaign5e.log   # continue the same narrative log
source scripts/campaign_lib.sh

note "=== campaign 5f start (supersedes 5e tail) ==="

# adopt the in-flight bench --bf16res started by 5e
BP=$(cat /tmp/q_bench_bf16.pid 2>/dev/null)
if [ -n "$BP" ] && pid_matches "$BP" "bench.py"; then
  note "adopting bench_bf16 pid $BP"
  touch -c /tmp/q_bench_bf16.log
  STALL=1200
  watch_pid "$BP" /tmp/q_bench_bf16.log || note "bench_bf16 wedged and was killed"
  STALL=900
fi
grep '"metric"' /tmp/q_bench_bf16.log > artifacts/round5/bench_bf16res.jsonl 2>/dev/null
note "bench_bf16 rows: $(tail -1 artifacts/round5/bench_bf16res.jsonl 2>/dev/null | cut -c1-200)"

# the one untested kernel config: bf16 residuals at the 64 MB VMEM ceiling
run_job vmem64_bf16res 1800 python scripts/tpu_kernel_sweep.py \
  --fused --vmem 64 --bf16res 4096

if [ ! -f artifacts/round5/clean_protocol_multisel.json ]; then
  run_job cleansel2 9000 python scripts/tpu_clean_protocol.py \
    --selection "0,0;75,0;0,-35"
fi

run_job sweep5e 21600 python scripts/tpu_contrast_sweep.py 6000 \
  --arms 2.4,1.6,1.2,0.8,0.5,0.35

run_job repair_wd 14400 python scripts/tpu_contrast_repair.py 6000 \
  --lca 0.18 --arms wd3,tv7,tv_wd_longwin

run_job longsched24 10800 python scripts/tpu_longsched.py 200000 --lca 2.4

note "=== CAMPAIGN 5F DONE ==="
