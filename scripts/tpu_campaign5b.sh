#!/bin/bash
# Round-5 follow-up campaign: paper-schedule (200k-iteration) runs.
#
# Rationale: every low-contrast experiment so far compressed the
# reference's 200k-iteration schedule into 6k steps; the post-peak
# collapse at 1.0x vessel contrast may be a schedule-compression
# artifact (window opens 33x faster, regularizers get 33x less time).
# One 200k run costs ~16 min of chip time, so run the decisive points
# at the reference's own pacing:
#   1. SYNTH contrast 0.18 (the XCAT-like 1.0x point) @ 200k
#   2. XCAT-surrogate (the paper-parity experiment)   @ 200k
#   3. SYNTH contrast 2.4 (flagship headline)         @ 200k
#   4. MAGIX retry safety net (campaign 5 normally covers it)
#   5. bench certification
#
# Waits for campaign 5 (PID file) to finish before touching the TPU.
# Usage: setsid bash scripts/tpu_campaign5b.sh &
echo $$ > /tmp/tpu_campaign5b.pid
cd /root/repo || exit 1
TAG=5b
source scripts/campaign_lib.sh

C5=$(cat /tmp/tpu_campaign5.pid 2>/dev/null)
if [ -n "$C5" ] && pid_matches "$C5" tpu_campaign5.sh; then
  note "waiting for campaign 5 (pid $C5)"
  while kill -0 "$C5" 2>/dev/null; do sleep 60; done
fi
note "=== campaign 5b start ==="

run_job longsched018 10800 python scripts/tpu_longsched.py 200000 --lca 0.18

# weight-decay arms: repair_forensics-0p18 diagnoses every conventional
# arm's collapse as 4-view memorization (train fit keeps improving while
# the 40-view image dies); decoupled AdamW decay is the direct counter
run_job repair_wd 14400 python scripts/tpu_contrast_repair.py 6000 \
  --lca 0.18 --arms wd3,wd2,wd_varmax_longwin

magix_ok() {
  python - <<'PY'
import json, sys
try:
    d = json.load(open("cases/MAGIX-SURR/surrogate_run.json"))
except Exception:
    sys.exit(1)
p = (d.get("headline_checkpoint_best") or {}).get("mean_psnr")
sys.exit(0 if isinstance(p, (int, float)) and p == p else 1)
PY
}
if ! magix_ok; then
  run_job magix5b 9000 python scripts/tpu_ccta_surrogate.py 6000
fi

run_job xcatlong 10800 python scripts/tpu_xcat_surrogate.py 200000

run_job longsched24 10800 python scripts/tpu_longsched.py 200000 --lca 2.4

run_job longsched018mid 7200 python scripts/tpu_longsched.py 50000 --lca 0.18

run_job bench5b 3600 python bench.py

note "=== CAMPAIGN 5B DONE ==="
