#!/bin/bash
# Campaign 5g: supersedes the 5f tail. With the kernel chapter closed and
# PROGRESS.jsonl showing the round runs for many hours of wall-clock, the
# XCAT-SURR paper-schedule run (TODO lever 2: 200k pacing at the hardest
# measured local contrast, 0.91x) is promoted ABOVE the bonus legs — it is
# the paper-parity experiment VERDICT r4 item 2 asked for, now affordable
# because scripts/prep_xcat5g.sh rebuilds the wiped XCAT-SURR dataset on
# CPU concurrently with the sweep's TPU time.
#
#   0. adopt the in-flight cleansel2 job (item 5)
#   1. contrast-curve re-train, 4 missing arms (item 4)
#   2. XCAT-SURR at 200k pacing (item 2 / TODO lever 2)
#   3. wd/TV repair arms at 0.18 (item 3 bonus)
#   4. flagship-contrast 200k (time-permitting)
#
# Usage: setsid bash scripts/tpu_campaign5g.sh &
echo $$ > /tmp/tpu_campaign5g.pid
cd /root/repo || exit 1
TAG=5g
mkdir -p logs5
L=/root/repo/logs5/campaign5e.log   # continue the same narrative log
source scripts/campaign_lib.sh

note "=== campaign 5g start (supersedes 5f tail) ==="

CS=$(cat /tmp/q_cleansel2.pid 2>/dev/null)
if [ -n "$CS" ] && pid_matches "$CS" tpu_clean_protocol; then
  note "adopting cleansel2 pid $CS"
  touch -c /tmp/q_cleansel2.log
  STALL=1200
  watch_pid "$CS" /tmp/q_cleansel2.log || note "cleansel2 wedged and was killed"
  STALL=900
fi
if [ ! -f artifacts/round5/clean_protocol_multisel.json ]; then
  run_job cleansel3 9000 python scripts/tpu_clean_protocol.py \
    --selection "0,0;75,0;0,-35"
fi

run_job sweep5e 21600 python scripts/tpu_contrast_sweep.py 6000 \
  --arms 2.4,1.6,1.2,0.8,0.5,0.35

# paper-parity crown: the reference's own pacing on the XCAT driver
# contract's output (local contrast 0.91x, the hardest measured point);
# stages 1+2 are prebuilt by prep_xcat5g.sh, so this leg is TPU-bound
run_job xcat200k 18000 python scripts/tpu_xcat_surrogate.py 200000

run_job repair_wd 14400 python scripts/tpu_contrast_repair.py 6000 \
  --lca 0.18 --arms wd3,tv7,tv_wd_longwin

run_job longsched24 10800 python scripts/tpu_longsched.py 200000 --lca 2.4

note "=== CAMPAIGN 5G DONE ==="
