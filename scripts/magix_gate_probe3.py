"""Step the real train chunk to the collapse step, then dissect the gate.

probe2 showed the step-58 batch is fully finite; the autopsy's NaN appears
at the step-60 batch (it advances the compiled chunk twice before
replaying). This replicates that exactly and bisects hull_gate internals
at the offending batch.

Usage: python scripts/magix_gate_probe3.py <checkpoint-dir> [n_advance=2]
"""
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def nf(name, arr):
    a = np.asarray(arr)
    n = int((~np.isfinite(a)).sum())
    fin = a[np.isfinite(a)]
    rng = (float(fin.min()), float(fin.max())) if fin.size else None
    print(f"{name}: shape={a.shape} nonfinite={n} range={rng}", flush=True)
    return a


def main():
    ckpt = sys.argv[1]
    n_adv = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from nerfca_tpu.train.config import apply_platform

    apply_platform("cpu")
    import jax
    import jax.numpy as jnp

    from tpu_ccta_surrogate import build
    from nerfca_tpu.train.trainer import prepare_composite
    from nerfca_tpu.train.step import (
        composite_forward, field_window, sample_ray_batch,
        jitter_directions, schedule_from_hp,
    )
    from nerfca_tpu.ops.sampling import stratify_depths

    args = build(6000)
    args.platform = "cpu"
    args.use_pallas = False
    args.use_fused_loss = False
    args.steps_per_chunk = 1
    args.resume_from = ckpt
    setup = prepare_composite(args)
    state = setup["state"]
    dd = setup["device_data"]
    hp, cfgs, hull = setup["hp"], setup["cfgs"], setup["hull"]
    chunk_fn = setup["chunk_fn"]
    sched = schedule_from_hp(hp)

    for i in range(n_adv):
        prev = jax.device_get(state)
        state, metrics = chunk_fn(
            state, dd["rays"], dd["phases"], dd["var_ids"], dd["non_var_ids"],
            1, sched, *((hull,) if hull is not None else ()),
        )
        nonfin = {
            f: int(sum((~np.isfinite(np.asarray(l))).sum()
                       for l in jax.tree.leaves(t)))
            for f, t in jax.device_get(state).params.items()
        }
        print(f"advanced past step {int(state.step) - 1}: "
              f"loss={float(np.asarray(metrics['train_loss'])[0]):.3e} "
              f"nonfinite={nonfin}", flush=True)

    params = jax.tree.map(jnp.asarray, prev.params)
    step = jnp.asarray(prev.step)
    rng = jnp.asarray(prev.rng)
    print("replaying batch of step", int(prev.step), flush=True)

    rng, k_sample, k_depth, k_fine = jax.random.split(rng, 4)
    batch = sample_ray_batch(
        k_sample, dd["rays"], dd["phases"], dd["var_ids"], dd["non_var_ids"], hp
    )
    dirs_pre = np.asarray(batch["directions"]).copy()
    if hp.ray_jitter > 0:
        k_jit = jax.random.fold_in(k_fine, 1)
        batch["directions"] = jitter_directions(
            k_jit, batch["directions"], hp.ray_jitter
        )
    batch["initial_intensities"] = jnp.full(
        (hp.img_sample_size,), setup["max_pixel_value"], jnp.float32
    )
    z = stratify_depths(k_depth, setup["depth_values"])
    windows = {
        "static": field_window(cfgs["static"], step),
        "temp": field_window(cfgs["temp"], step),
    }

    dirs = nf("directions (post-jitter)", batch["directions"])
    orig = nf("origins", batch["origins"])
    zv = nf("z", z)

    fwd = composite_forward(params, batch, z, windows, cfgs, hp, None, hull=hull)
    t_sig = nf("temp_sigma_coarse", fwd["temp_sigma_coarse"])
    nf("temp_raw_coarse", fwd["temp_raw_coarse"])
    gate = nf("temp_gate_coarse", fwd.get("temp_gate_coarse", np.zeros(1)))
    nf("pix_coarse", fwd["pix_coarse"])

    bad = np.argwhere(~np.isfinite(np.asarray(gate)))
    if not bad.size:
        bad = np.argwhere(~np.isfinite(t_sig))
    if not bad.size:
        print("forward fully finite at this batch")
        return
    r, s = (int(v) for v in bad[0])
    print(f"\nfirst bad element ray={r} sample={s} "
          f"(bad rays: {sorted(set(int(b) for b in bad[:, 0]))[:10]})")
    print("dir pre-jitter:", dirs_pre[r], "post:", dirs[r])
    print("origin:", orig[r])

    # dissect hull_gate at that single position
    x = float(orig[r, 0] + dirs[r, 0] * zv[s])
    y = float(orig[r, 1] + dirs[r, 1] * zv[s])
    w = float(orig[r, 2] + dirs[r, 2] * zv[s])
    print("pos:", x, y, w)
    g = np.asarray(hull.grid)
    dv = np.asarray(hull.d_voxel)
    off = np.asarray(hull.off)
    rx, ry, rz = g.shape
    gx = (x - off[0]) / dv[0] + (rx - 1) / 2
    gy = (y - off[1]) / dv[1] + (ry - 1) / 2
    gz = (w - off[2]) / dv[2] + (rz - 1) / 2
    print("grid coords:", gx, gy, gz)


if __name__ == "__main__":
    main()
