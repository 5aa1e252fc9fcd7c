#!/bin/bash
# Rebuild the wiped XCAT-SURR tree (surrogate driver contract, 10 phases,
# 512x512x401) + its projection dataset on CPU, after prep_round5e's
# contrast datasets finish (single core — serialize the builders).
#
# Usage: setsid bash scripts/prep_xcat5g.sh &
echo $$ > /tmp/prep_xcat5g.pid
cd /root/repo || exit 1
mkdir -p logs5
exec >> logs5/prep_xcat5g.log 2>&1

echo "=== prep_xcat5g start $(date +%H:%M:%S) ==="
P=$(cat /tmp/prep5e.pid 2>/dev/null)
while [ -n "$P" ] && kill -0 "$P" 2>/dev/null; do sleep 60; done
echo "prep5e done, starting XCAT stages $(date +%H:%M:%S)"

nice -n 19 python - <<'EOF'
import sys
sys.path.insert(0, 'scripts'); sys.path.insert(0, '.')
import tpu_xcat_surrogate as x
x.stage1_xcat_pipeline()
x.stage2_dataset(200000)
EOF
echo "=== PREP_XCAT5G DONE $(date +%H:%M:%S) ==="
