#!/bin/bash
# Poll the axon TPU backend until it answers; write status to /tmp/tpu_alive.
# Usage: bash scripts/tpu_probe.sh [max_attempts]
max=${1:-40}
for i in $(seq 1 "$max"); do
  echo "$(date +%H:%M:%S) probe $i" >> /tmp/tpu_probe.log
  if timeout 580 python -c "
import jax, time
t0 = time.time()
d = jax.devices()
import jax.numpy as jnp
x = jnp.ones((8, 128))
v = float((x @ x.T).sum())
print(f'{d} val={v} t={time.time()-t0:.1f}s')
" >> /tmp/tpu_probe.log 2>&1; then
    echo "ALIVE $(date +%H:%M:%S)" > /tmp/tpu_alive
    exit 0
  fi
  echo "$(date +%H:%M:%S) probe $i failed" >> /tmp/tpu_probe.log
  sleep 60
done
echo "DEAD $(date +%H:%M:%S)" > /tmp/tpu_alive
exit 1
