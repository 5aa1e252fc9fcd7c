"""Capture a jax.profiler device trace of the fused train step and
aggregate op-level durations (MXU vs VPU attribution by op name).

Round-1 precedent: device traces through the axon tunnel worked and drove
the compact-layout rewrite (BENCH.md round 1). This script makes the
workflow turnkey for the routing-surgery kernel: 30 timed steps at the
flagship shape under ``jax.profiler.trace``, then a stdlib parse of the
perfetto trace json (no tensorboard needed) printing the top op groups.

Usage: python scripts/tpu_profile_step.py [tile=4096] [vmem_mb=100]
"""
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRACE_DIR = "/tmp/fused_step_trace"


def run(tile: int, vmem_mb: int):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_setup
    from nerfca_tpu.ops.sampling import linspace_depths
    from nerfca_tpu.train.step import (
        TrainState,
        make_composite_train_step,
        make_optimizer,
    )

    params, cfgs, hp = _flagship_setup()
    hp = dataclasses.replace(hp, use_pallas=True, pallas_tile=tile,
                             use_fused_loss=True, pallas_vmem_mb=vmem_mb)
    tx = make_optimizer(1e-3, 0.01, 150000)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32),
                       rng=jax.random.PRNGKey(0))
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    step_fn = jax.jit(make_composite_train_step(cfgs, hp, tx, z, 2.16),
                      donate_argnums=(0,))

    n_rays = 100_000
    key = jax.random.PRNGKey(1)
    rays = jax.random.uniform(key, (n_rays, 4, 3), jnp.float32)
    rays = rays.at[:, 3, :].set(1.0)
    phases = jax.random.randint(key, (n_rays,), 0, 10)
    var_ids = jnp.arange(n_rays // 2, dtype=jnp.int32)
    non_var_ids = jnp.arange(n_rays // 2, n_rays, dtype=jnp.int32)

    # compile + warm OUTSIDE the trace
    for _ in range(3):
        state, m = step_fn(state, rays, phases, var_ids, non_var_ids)
    jax.block_until_ready(m["train_loss"])

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(30):
            state, m = step_fn(state, rays, phases, var_ids, non_var_ids)
        jax.block_until_ready(m["train_loss"])
    print("trace captured to", TRACE_DIR, flush=True)


def parse():
    paths = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("NO trace.json.gz found — remote backend may not emit "
              "device traces; inspect", TRACE_DIR)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: perfetto pids/tids named via metadata events
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    by_op = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        # collapse fusion instances: strip trailing .N / digits
        key = name.split(".")[0]
        by_op[key] += dur
        total += dur
    rows = sorted(by_op.items(), key=lambda kv: -kv[1])[:30]
    print(f"device-side total {total:.2f} ms over 30 steps "
          f"({total/30:.3f} ms/step)")
    for k, v in rows:
        print(f"  {v/30:8.4f} ms/step  {100*v/max(total,1e-9):5.1f}%  {k}")


def main():
    tile = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    vmem = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    run(tile, vmem)
    parse()


if __name__ == "__main__":
    main()
