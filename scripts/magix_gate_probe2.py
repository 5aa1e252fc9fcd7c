"""Bisect the NaN inside composite_forward at the MAGIX collapse batch.

magix_gate_probe.py showed every gate input AND the standalone gate are
finite, while magix_autopsy.py shows fwd['temp_sigma_coarse'] is NaN at
the same state+batch. Reproduce fwd and localize the first NaN element.

Usage: python scripts/magix_gate_probe2.py <checkpoint-dir>
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
    print(f"{name}: shape={a.shape} nonfinite={n}")
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
        composite_forward, field_window, sample_ray_batch,
        jitter_directions,
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

    prev = jax.device_get(state)
    params = jax.tree.map(jnp.asarray, prev.params)
    step = jnp.asarray(prev.step)
    rng = jnp.asarray(prev.rng)

    rng, k_sample, k_depth, k_fine = jax.random.split(rng, 4)
    batch = sample_ray_batch(
        k_sample, dd["rays"], dd["phases"], dd["var_ids"], dd["non_var_ids"], hp
    )
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

    fwd = composite_forward(params, batch, z, windows, cfgs, hp, None, hull=hull)
    t_raw = nf("temp_raw_coarse", fwd["temp_raw_coarse"])
    s_raw = nf("static_raw_coarse", fwd["static_raw_coarse"])
    t_sig = nf("temp_sigma_coarse", fwd["temp_sigma_coarse"])
    gate = nf("temp_gate_coarse", fwd.get("temp_gate_coarse", np.zeros(1)))
    nf("pix_coarse", fwd["pix_coarse"])
    nf("phases", batch["phases"])
    bad = np.argwhere(~np.isfinite(t_sig))
    if bad.size:
        r, s = bad[0]
        print(f"first bad t_sig at ray={r} sample={s}")
        print("  t_raw[..., -1] there:", t_raw[r, s, -1] if t_raw.ndim == 3
              else t_raw[r, s])
        print("  gate there:", gate[r, s])
        print("  phase:", np.asarray(batch["phases"])[r])
        print("  n bad rays:", len(np.unique(bad[:, 0])),
              "n bad elements:", bad.shape[0])
        # recompute the gate standalone at the same inputs
        from nerfca_tpu.ops.hull import hull_gate_rays

        g2 = hull_gate_rays(hull, batch["origins"], batch["directions"], z)
        print("standalone gate nonfinite:", int((~np.isfinite(np.asarray(g2))).sum()))
        print("standalone gate there:", np.asarray(g2)[r, s])
    else:
        print("t_sig fully finite this time")


if __name__ == "__main__":
    main()
