#!/bin/bash
# Poll the axon TPU backend until it answers; write status to /tmp/tpu_alive.
# Usage: bash scripts/tpu_probe.sh [max_attempts] [per_attempt_timeout_s]
# Writes its own PID to /tmp/tpu_probe.pid (kill by PID, never by pattern).
echo $$ > /tmp/tpu_probe.pid
max=${1:-40}
t=${2:-580}
for i in $(seq 1 "$max"); do
  echo "$(date +%H:%M:%S) probe $i (timeout ${t}s)" >> /tmp/tpu_probe.log
  if timeout "$t" python -c "
import jax, time
t0 = time.time()
d = jax.devices()
print('devices', d, 'init %.1fs' % (time.time()-t0), flush=True)
import jax.numpy as jnp
x = jnp.ones((8, 128))
v = float((x @ x.T).sum())
print('val=%s total=%.1fs' % (v, time.time()-t0))
" >> /tmp/tpu_probe.log 2>&1; then
    echo "ALIVE $(date +%H:%M:%S)" > /tmp/tpu_alive
    exit 0
  fi
  echo "$(date +%H:%M:%S) probe $i failed" >> /tmp/tpu_probe.log
  sleep 120
done
echo "DEAD $(date +%H:%M:%S)" > /tmp/tpu_alive
exit 1
