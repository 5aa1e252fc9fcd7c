#!/bin/bash
# CPU dataset rebuilds for campaign 5e, in queue order, after the
# 2026-08-20 VM restart wiped data/. Each build goes through the owning
# script's own prepare_dataset_cpu (same tags, same lockfile protocol),
# nice'd so the TPU legs' host threads keep the core.
#
# Usage: setsid bash scripts/prep_round5e.sh &
echo $$ > /tmp/prep5e.pid
cd /root/repo || exit 1
mkdir -p logs5
exec >> logs5/prep5e.log 2>&1

echo "=== prep5e start $(date +%H:%M:%S) ==="

# 1. the clean-protocol multisel dataset (tag encodes the selection views)
nice -n 19 python - <<'EOF'
import sys
sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
import tpu_clean_protocol as cp
cp.SELECTION = "0,0;75,0;0,-35"
cp.prepare_dataset_cpu()
EOF
echo "cleansel dataset done $(date +%H:%M:%S)"

# 2. contrast-curve arms in sweep order, then the 0.18 repair dataset
for lca in 2.4 1.6 1.2 0.8 0.5 0.35 0.18; do
  nice -n 19 python - <<EOF
import sys
sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
import tpu_contrast_sweep as s
s.prepare_dataset_cpu(6000, s.arm_overrides("$lca"))
EOF
  echo "contrast $lca dataset done $(date +%H:%M:%S)"
done

echo "=== PREP5E DONE $(date +%H:%M:%S) ==="
