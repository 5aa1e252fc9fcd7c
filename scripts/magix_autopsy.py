"""Single-step NaN autopsy for the MAGIX-SURR divergence (round-5 item 1).

Loads a pre-collapse checkpoint (CPU, XLA path), advances the REAL compiled
train step one step at a time until the params go non-finite, then replays
the offending step's exact batch (same rng derivation as
``step.py::make_composite_train_step``) and reports, per loss term, the
gradient norm / max / non-finite count for each field — plus forward-pass
extrema (raw field outputs, blendw, entropy inputs) at the failing batch.

Usage: python scripts/magix_autopsy.py <checkpoint-dir> [max_steps=12]
"""
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def tree_finite(tree):
    import jax

    return {
        f: int(sum((~np.isfinite(np.asarray(l))).sum()
                   for l in jax.tree.leaves(t)))
        for f, t in tree.items()
    }


def grad_stats(grads):
    import jax

    rows = {}
    for field, tree in grads.items():
        leaves = jax.tree.leaves(tree)
        flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
        fin = flat[np.isfinite(flat)]
        rows[field] = {
            "norm": float(np.linalg.norm(fin)) if fin.size else None,
            "max_abs": float(np.abs(fin).max()) if fin.size else None,
            "n_nonfinite": int((~np.isfinite(flat)).sum()),
        }
    return rows


def main():
    ckpt = sys.argv[1]
    max_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    from nerfca_tpu.train.config import apply_platform

    apply_platform("cpu")
    import jax
    import jax.numpy as jnp

    from tpu_ccta_surrogate import build
    from nerfca_tpu.train.trainer import prepare_composite
    from nerfca_tpu.train.step import (
        composite_forward, field_window, loss_weights, sample_ray_batch,
        jitter_directions, schedule_from_hp,
    )
    from nerfca_tpu.ops.sampling import stratify_depths
    from nerfca_tpu.ops import losses as L
    from nerfca_tpu.ops.losses import weighted_mse

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
    print("start step:", int(state.step))

    prev = state
    bad_step = None
    for _ in range(max_steps):
        prev = jax.device_get(state)  # host copy (keeps typed PRNG keys)
        state, metrics = chunk_fn(
            state, dd["rays"], dd["phases"], dd["var_ids"], dd["non_var_ids"],
            1, sched, *((hull,) if hull is not None else ()),
        )
        nf = tree_finite(state.params)
        loss_v = float(np.asarray(metrics["train_loss"])[0])
        print(f"after step {int(state.step) - 1}: loss={loss_v:.3e} "
              f"nonfinite params={nf}")
        if any(nf.values()):
            bad_step = int(prev.step)
            break
    if bad_step is None:
        print("no divergence within", max_steps, "steps")
        return

    print(f"\n=== replaying step {bad_step} from the pre-collapse state ===")
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

    # forward extrema at the failing batch
    fwd = composite_forward(params, batch, z, windows, cfgs, hp, None, hull=hull)
    s_sig = np.asarray(fwd["static_sigma_coarse"])
    t_sig = np.asarray(fwd["temp_sigma_coarse"])
    t_raw = np.asarray(fwd["temp_raw_coarse"])
    s_raw = np.asarray(fwd["static_raw_coarse"])
    gate = np.asarray(fwd.get("temp_gate_coarse", np.zeros(1)))
    blendw = t_sig / (s_sig + t_sig + 1e-10)
    print(json.dumps({
        "s_raw": [float(s_raw.min()), float(s_raw.max())],
        "t_raw": [float(t_raw.min()), float(t_raw.max())],
        "s_sig": [float(s_sig.min()), float(s_sig.max())],
        "t_sig": [float(t_sig.min()), float(t_sig.max())],
        "gate_nonzero_frac": float((gate > 0).mean()),
        "blendw": [float(blendw.min()), float(blendw.max())],
        "pix": [float(np.asarray(fwd['pix_coarse']).min()),
                float(np.asarray(fwd['pix_coarse']).max())],
        "nonfinite_t_raw": int((~np.isfinite(t_raw)).sum()),
        "nonfinite_s_raw": int((~np.isfinite(s_raw)).sum()),
    }, indent=1))

    def term_fns(p):
        fwd = composite_forward(p, batch, z, windows, cfgs, hp, None, hull=hull)
        ls = L.composite_losses(
            fwd["static_sigma_coarse"], fwd["temp_sigma_coarse"],
            fwd["dists_coarse"], batch["weights"],
            skewness_val=hp.skewness_val,
            entro_mask_thre=hp.entro_mask_thre,
            entro_use_weighting=hp.entro_use_weighting,
            entro_weighted_thresh=hp.entro_weighted_thresh,
            occl_reg_perc=hp.occl_reg_perc,
            entro_clip_threshold=hp.entro_clip_threshold,
            occl_front_only=hp.occl_front_only,
        )
        pix = jnp.mean(
            weighted_mse(fwd["pix_coarse"], batch["pixels"], batch["weights"])
        )
        hull_l1 = jnp.float32(0.0)
        if hull is not None:
            hull_l1 = jnp.mean(jnp.sum(
                fwd["static_sigma_coarse"] * fwd["dists_coarse"]
                * fwd["temp_gate_coarse"], axis=-1))
        return {
            "pixel": pix,
            "favor_s": ls.favor_s_loss,
            "d_entropy": ls.dynamic_entropy_loss,
            "s_entropy": ls.static_entropy_loss,
            "d_occl": ls.dynamic_occl_loss,
            "s_l1": ls.static_l1_loss,
            "s_l2": ls.static_l2_loss,
            "hull_s_l1": hull_l1,
        }

    w = loss_weights(step, hp, sched)
    print("[weights]", json.dumps({k: float(v) for k, v in w.items()}))
    vals = term_fns(params)
    for name in vals:
        g = jax.grad(lambda p: term_fns(p)[name])(params)
        print(f"\n[term {name}] value = {float(vals[name]):.6g}")
        print(json.dumps(grad_stats(g), indent=1))


if __name__ == "__main__":
    main()
