"""Pinpoint the NaN source inside the motion-hull gate for MAGIX-SURR.

Follow-up to scripts/magix_autopsy.py, which showed t_raw finite but
t_sig/blendw/pix NaN at the replayed collapse batch => the hull gate is
the only remaining factor. This loads the same pre-collapse checkpoint,
rebuilds the same batch, and inspects every gate input (hull grid,
positions, depth values, directions) plus the gate output elementwise.

Usage: python scripts/magix_gate_probe.py <checkpoint-dir>
"""
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def finite_report(name, arr):
    a = np.asarray(arr)
    n = (~np.isfinite(a)).sum()
    fin = a[np.isfinite(a)]
    rng = (float(fin.min()), float(fin.max())) if fin.size else None
    print(f"{name}: shape={a.shape} nonfinite={int(n)} range={rng}")
    return a


def main():
    ckpt = sys.argv[1]

    from nerfca_tpu.train.config import apply_platform

    apply_platform("cpu")
    import jax
    import jax.numpy as jnp

    from tpu_ccta_surrogate import build
    from nerfca_tpu.train.trainer import prepare_composite
    from nerfca_tpu.train.step import (
        field_window, sample_ray_batch, jitter_directions, schedule_from_hp,
    )
    from nerfca_tpu.ops.sampling import stratify_depths
    from nerfca_tpu.ops.hull import hull_gate_rays, hull_gate

    args = build(6000)
    args.platform = "cpu"
    args.use_pallas = False
    args.use_fused_loss = False
    args.steps_per_chunk = 1
    args.resume_from = ckpt
    setup = prepare_composite(args)
    state = setup["state"]
    dd = setup["device_data"]
    hp, hull = setup["hp"], setup["hull"]
    print("start step:", int(state.step))

    finite_report("hull.grid", hull.grid)
    finite_report("hull.d_voxel", hull.d_voxel)
    finite_report("hull.off", hull.off)
    finite_report("rays", dd["rays"])

    rng = jnp.asarray(jax.device_get(state).rng)
    rng, k_sample, k_depth, k_fine = jax.random.split(rng, 4)
    batch = sample_ray_batch(
        k_sample, dd["rays"], dd["phases"], dd["var_ids"], dd["non_var_ids"], hp
    )
    dirs0 = finite_report("directions (pre-jitter)", batch["directions"])
    if hp.ray_jitter > 0:
        k_jit = jax.random.fold_in(k_fine, 1)
        batch["directions"] = jitter_directions(
            k_jit, batch["directions"], hp.ray_jitter
        )
    dirs = finite_report("directions (post-jitter)", batch["directions"])
    orig = finite_report("origins", batch["origins"])
    z = stratify_depths(k_depth, setup["depth_values"])
    zv = finite_report("z (stratified)", z)
    finite_report("depth_values", setup["depth_values"])

    gate = hull_gate_rays(hull, batch["origins"], batch["directions"], z)
    g = finite_report("gate", gate)

    bad = np.argwhere(~np.isfinite(g))
    if bad.size:
        r, s = bad[0]
        print(f"\nfirst bad element: ray={r} sample={s}")
        zz = zv if zv.ndim == 2 else zv[None, :]
        x = orig[r, 0] + dirs[r, 0] * zz[min(r, zz.shape[0] - 1), s]
        y = orig[r, 1] + dirs[r, 1] * zz[min(r, zz.shape[0] - 1), s]
        w = orig[r, 2] + dirs[r, 2] * zz[min(r, zz.shape[0] - 1), s]
        print("pos:", x, y, w)
        print("dir row:", dirs[r], "pre-jitter:", dirs0[r])
        print("origin row:", orig[r])
        val = hull_gate(hull, jnp.asarray([[x]]), jnp.asarray([[y]]),
                        jnp.asarray([[w]]))
        print("isolated gate value:", np.asarray(val))
    else:
        print("gate fully finite — NaN is NOT in the gate at this batch")


if __name__ == "__main__":
    main()
