#!/bin/bash
# Round-5 recovery campaign (post VM-wipe): re-run every TPU leg whose
# evidence was lost with data/ and cases/, in evidence-value order.
#
#   0. adopt the in-flight paper-schedule 0.18 run (the decisive
#      schedule-compression experiment); wedge-resume if the tunnel dies
#   1. MAGIX-SURR 6k re-evidence (VERDICT item 1 ledger was wiped)
#   2. clean-protocol rerun with 3-view model selection (item 5)
#   3. weight-decay repair arms at 0.18 (item 3; the forensics diagnose
#      4-view memorization — decoupled decay is the direct counter)
#   4. XCAT-SURR 6k re-evidence (item 2; dataset rebuilt by prep script)
#   5. contrast-curve re-train, 6 arms (item 4; 0.18 base survives in the
#      committed artifacts/round5/contrast_curve.json)
#   6. kernel isolation + VMEM sweep (item 6)
#   7. bench certification
#   8. time-permitting: XCAT 200k + flagship-contrast 200k
#
# Usage: setsid bash scripts/tpu_campaign5c.sh &
echo $$ > /tmp/tpu_campaign5c.pid
cd /root/repo || exit 1
TAG=5c
L=/root/repo/logs5/campaign5c.log
source scripts/campaign_lib.sh

note "=== campaign 5c start ==="

find_longsched_pid() {
  # match the interpreter process EXACTLY (argv[0]=python*,
  # argv[1]=scripts/tpu_longsched.py) — a substring match also hits the
  # session shell that launched it, whose eval'd command string contains
  # the script name; killing that group would kill the operator session
  local pid a0 a1
  for pid in /proc/[0-9]*; do
    pid=${pid#/proc/}
    a0=$(tr '\0' '\n' < "/proc/$pid/cmdline" 2>/dev/null | sed -n 1p)
    a1=$(tr '\0' '\n' < "/proc/$pid/cmdline" 2>/dev/null | sed -n 2p)
    case "$a0" in
      python*|*/python*) ;;
      *) continue ;;
    esac
    [ "$a1" = "scripts/tpu_longsched.py" ] || continue
    echo "$pid"; return 0
  done
  return 1
}

longsched_done() {
  python - <<'PY'
import json, sys
try:
    rows = json.load(open("artifacts/round5/longsched.json"))
except Exception:
    sys.exit(1)
ok = any(r.get("synth_lca_val") == "0.18" and r.get("n_iters") == 200000
         and ("stability" in r or r.get("status") == "DIVERGED")
         for r in rows)
sys.exit(0 if ok else 1)
PY
}

# --- 0: the in-flight longsched018 run ---
for round in 1 2 3; do
  if longsched_done; then note "longsched018 ledger complete"; break; fi
  LSPID=$(find_longsched_pid)
  if [ -n "$LSPID" ]; then
    note "adopting longsched018 pid $LSPID"
    # the remote-compile phase is log-quiet for up to ~10 min and the log
    # may already be old at adoption: restart the staleness clock and
    # allow 40 min (resume-from-checkpoint makes a late kill cheap)
    touch -c logs5/longsched018.log
    STALL=2400
    if watch_pid "$LSPID" logs5/longsched018.log; then
      note "longsched018 exited cleanly"
    else
      note "longsched018 wedged and was killed; will resume"
    fi
    STALL=900
  fi
  if longsched_done; then break; fi
  CK=$(ls -dt cases/SYNTH-FOVC0p18/runs/*/checkpoint-[0-9]* 2>/dev/null | head -1)
  if [ -n "$CK" ]; then
    note "resuming longsched018 from $CK"
    run_job longsched018r 10800 python scripts/tpu_longsched.py 200000 \
      --lca 0.18 --resume "$CK"
  else
    note "no checkpoint to resume; restarting longsched018 fresh"
    run_job longsched018f 10800 python scripts/tpu_longsched.py 200000 --lca 0.18
  fi
done

# The 200k run occupies the chip ~2.5h (40.6 ms/step at the 4096-ray
# hull+jitter recipe + ~20 ckpt evals); order the rest by evidence value
# for the ~1.5h that will remain. xcat is sentinel-gated WITHOUT blocking
# (checked between jobs; the CPU prep builder writes the sentinel).

try_xcat() {
  if [ -f /tmp/xcat5c.done ]; then return 0; fi
  if [ -f data/XCAT-SURR/.prep_done ]; then
    run_job xcat5c 10800 python scripts/tpu_xcat_surrogate.py 6000 \
      && touch /tmp/xcat5c.done
  else
    note "xcat dataset not ready; skipping for now"
  fi
}

run_job magix5c 9000 python scripts/tpu_ccta_surrogate.py 6000

try_xcat

run_job cleansel 9000 python scripts/tpu_clean_protocol.py \
  --selection "0,0;75,0;0,-35"

run_job isolation5c 3600 python scripts/tpu_kernel_isolation.py
run_job vmem64_5c 1800 python scripts/tpu_kernel_sweep.py --fused --vmem 64 4096

run_job bench5c 3600 python bench.py

try_xcat

# one decay arm + the two new TV arms (smoothness prior; ~2x step time
# on the XLA fallback path) — diversity over repetition given chip time
run_job repair_wd 14400 python scripts/tpu_contrast_repair.py 6000 \
  --lca 0.18 --arms wd3,tv7,tv_wd_longwin

run_job vmem115_5c 1800 python scripts/tpu_kernel_sweep.py --fused --vmem 115 4096

try_xcat

run_job sweep5c 21600 python scripts/tpu_contrast_sweep.py 6000 \
  --arms 2.4,1.6,1.2,0.8,0.5,0.35

run_job longsched24 10800 python scripts/tpu_longsched.py 200000 --lca 2.4

note "=== CAMPAIGN 5C DONE ==="
