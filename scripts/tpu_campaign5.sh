#!/bin/bash
# Round-5 TPU campaign, ordered by evidence value (VERDICT r4 items 1-6):
#   1. XCAT-surrogate paper-parity train on the built 17 GB dataset (item 2)
#   2. MAGIX-SURR end-to-end headline after the NaN fix (item 1) — gated on
#      /tmp/magix_fix.ok so the fix can land while XCAT trains; if the
#      sentinel is still absent the leg is retried at the end of the queue
#   3. contrast repair at the decisive 0.18 point w/ freeze+combo arms (item 3)
#   4. clean-protocol rerun with 3-view model selection (item 5)
#   5. finish the contrast-curve backfill for the 4 unevaluated base arms
#      (item 4; the 0.5-contrast repair arms come last — wrong contrast)
#   6. kernel campaign 4c: fwd/bwd isolation + VMEM sweep (item 6)
#   7. bench certification
#
# Usage: setsid bash scripts/tpu_campaign5.sh &
echo $$ > /tmp/tpu_campaign5.pid
cd /root/repo || exit 1
TAG=5
source scripts/campaign_lib.sh

note "=== campaign 5 start ==="

run_job xcat5 9000 python scripts/tpu_xcat_surrogate.py 6000

MAGIX_DONE=0
if [ -f /tmp/magix_fix.ok ]; then
  run_job magix5 9000 python scripts/tpu_ccta_surrogate.py 6000 && MAGIX_DONE=1
fi

run_job repair5 21600 python scripts/tpu_contrast_repair.py 6000 --lca 0.18

if [ "$MAGIX_DONE" -eq 0 ] && [ -f /tmp/magix_fix.ok ]; then
  run_job magix5 9000 python scripts/tpu_ccta_surrogate.py 6000 && MAGIX_DONE=1
fi

run_job cleansel 9000 python scripts/tpu_clean_protocol.py --selection "0,0;75,0;0,-35"

run_job backfill_base 9000 python scripts/backfill_contrast_evals.py \
  --glob 'cases/SYNTH-FOVC[012]p[2468]*/runs/*'

if [ "$MAGIX_DONE" -eq 0 ] && [ -f /tmp/magix_fix.ok ]; then
  run_job magix5 9000 python scripts/tpu_ccta_surrogate.py 6000 && MAGIX_DONE=1
fi

run_job isolation5 3600 python scripts/tpu_kernel_isolation.py
run_job vmem64_5  1800 python scripts/tpu_kernel_sweep.py --fused --vmem 64 4096
run_job vmem115_5 1800 python scripts/tpu_kernel_sweep.py --fused --vmem 115 4096

run_job backfill_rest 21600 python scripts/backfill_contrast_evals.py

run_job bench5 3600 python bench.py

note "=== CAMPAIGN 5 DONE ==="
