"""Measure composite-step time across fused-kernel variants on the TPU.

Chains measurements through donated state in ONE process (identical-input
calls through the axon executor get deduplicated — see TODO.md), compiling
progressively. Usage:

    python scripts/tpu_kernel_sweep.py [--fused] [tile ...]  # default: 1024 512 2048

``--fused`` measures the monolithic train-gradient kernel path
(use_fused_loss) instead of the two-kernel path.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(tile: int, steps_per_chunk: int = 20, timed_chunks: int = 5,
            fused: bool = False, vmem_mb: int = 0, dtype: str = "float32",
            bf16_res: bool = False):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_setup
    from nerfca_tpu.ops.sampling import linspace_depths
    from nerfca_tpu.train.step import (
        TrainState,
        make_composite_train_step,
        make_optimizer,
        make_train_chunk,
    )

    params, cfgs, hp = _flagship_setup()
    hp = dataclasses.replace(hp, use_pallas=True, pallas_tile=tile,
                             use_fused_loss=fused, pallas_vmem_mb=vmem_mb,
                             compute_dtype=dtype,
                             pallas_bf16_residuals=bf16_res)
    tx = make_optimizer(1e-3, 0.01, 150000)
    state = TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        rng=jax.random.PRNGKey(0),
    )
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    train_step = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    single = jax.jit(train_step, donate_argnums=(0,))
    chunk = jax.jit(make_train_chunk(train_step, steps_per_chunk),
                    donate_argnums=(0,))

    n_rays = 200 * 200 * 10
    key = jax.random.PRNGKey(1)
    rays = jax.random.uniform(key, (n_rays, 4, 3), jnp.float32)
    rays = rays.at[:, 3, :].set(1.0)
    phases = jax.random.randint(key, (n_rays,), 0, 10)
    var_ids = jnp.arange(n_rays // 2, dtype=jnp.int32)
    non_var_ids = jnp.arange(n_rays // 2, n_rays, dtype=jnp.int32)

    t0 = time.time()
    state, m = single(state, rays, phases, var_ids, non_var_ids)
    jax.block_until_ready(m["train_loss"])
    print(f"  tile {tile}: single-step compile+run {time.time()-t0:.0f}s")
    t0 = time.time()
    state, m = chunk(state, rays, phases, var_ids, non_var_ids)
    jax.block_until_ready(state.params)
    print(f"  tile {tile}: chunk compile+run {time.time()-t0:.0f}s")

    def timed():
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(timed_chunks):
            state, _m = chunk(state, rays, phases, var_ids, non_var_ids)
        jax.block_until_ready(state.params)
        dt = time.perf_counter() - t0
        return dt / (timed_chunks * steps_per_chunk) * 1e3

    ms = timed()
    suspect = False
    if ms < 1.0:
        # physically impossible at flagship shapes (the kernel's VPU floor
        # is ~4 ms) — the remote tunnel occasionally returns without the
        # timed dispatch (the bogus 0.019 ms vmem-115 row of campaign 4t).
        # Re-measure once; if still sub-ms, flag the row as unusable.
        print(f"  tile {tile}: {ms:.3f} ms/step is sub-physical; re-measuring")
        ms = timed()
        suspect = ms < 1.0
    rps = hp.img_sample_size / (ms / 1e3)
    row = {"tile": tile, "vmem_mb": vmem_mb, "dtype": dtype,
           "bf16_res": bf16_res, "ms_per_step": round(ms, 3),
           "rays_per_sec": round(rps)}
    if suspect:
        row["suspect"] = True
    print(json.dumps(row))
    return ms


def main():
    argv = sys.argv[1:]
    fused = '--fused' in argv
    argv = [a for a in argv if a != '--fused']
    dtype = "float32"
    if '--bf16' in argv:
        dtype = "bfloat16"
        argv = [a for a in argv if a != '--bf16']
    bf16_res = '--bf16res' in argv
    argv = [a for a in argv if a != '--bf16res']
    vmem_mb = 0
    if '--vmem' in argv:
        i = argv.index('--vmem')
        vmem_mb = int(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    tiles = [int(t) for t in argv] or [1024, 512, 2048]
    results = {}
    for t in tiles:
        try:
            results[t] = measure(t, fused=fused, vmem_mb=vmem_mb, dtype=dtype,
                                 bf16_res=bf16_res)
        except Exception as e:  # keep sweeping other tiles
            print(f"  tile {t} FAILED: {type(e).__name__}: {e}")
    print("SUMMARY", json.dumps({str(k): round(v, 3) for k, v in results.items()}))
    # mirror into the committed artifacts tree (campaign /tmp logs do not
    # survive wipes); one file per sweep configuration, rows keyed by tile
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ledgers import write_json_mirrored
    tag = f"{'fused' if fused else 'field'}-{dtype}" \
          f"{'-bf16res' if bf16_res else ''}-vmem{vmem_mb}"
    write_json_mirrored(
        {"config": tag, "ms_per_step_by_tile":
         {str(k): round(v, 3) for k, v in results.items()}},
        f"artifacts/round5/kernel_sweep-{tag}.json")
    if not results:
        sys.exit(1)  # every tile failed — let the supervisor retry


if __name__ == "__main__":
    main()
