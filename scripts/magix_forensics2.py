"""Stage-2 NaN forensics: per-term gradient autopsy at the pre-collapse state.

Stage 1 (scripts/magix_forensics.py) pinned the MAGIX-SURR divergence at
step 126: all DYNAMIC-field loss terms go NaN while the static terms stay
finite — the step-125 gradient wrt the temporal params is non-finite.

This script has two modes:
  train  — run exactly 125 steps of the identical config and save
           checkpoint-125 (run on TPU; one compile)
  autopsy <ckpt> — load the pre-collapse state (CPU ok), rebuild the exact
           step-125 batch from the checkpointed rng, and compute
             (a) full grads via the XLA path,
             (b) full grads via the fused Pallas path (interpret on CPU),
             (c) the gradient of EACH raw loss term separately,
           reporting per-field norms and non-finite counts.

Usage:
  python scripts/magix_forensics2.py train
  python scripts/magix_forensics2.py autopsy <log_dir/checkpoint-125>
"""
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

import numpy as np


def mode_train():
    from nerfca_tpu.train.trainer import train_composite
    from tpu_ccta_surrogate import build

    args = build(6000)
    args.n_iters = 124  # n_total = 125 -> state ends AT step 125, pre-NaN
    args.log_every = 25
    args.steps_per_chunk = 25
    args.display_every = 10_000_000
    args.save_every = 125
    out = train_composite(args)
    print("log_dir:", out["log_dir"], "final_step:", out["final_step"])


def grad_stats(grads):
    rows = {}
    for field, tree in grads.items():
        import jax

        leaves = jax.tree.leaves(tree)
        flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
        rows[field] = {
            "norm": float(np.linalg.norm(flat[np.isfinite(flat)])),
            "max_abs": float(np.abs(flat[np.isfinite(flat)]).max())
            if np.isfinite(flat).any() else None,
            "n_nonfinite": int((~np.isfinite(flat)).sum()),
            "n": int(flat.size),
        }
    return rows


def mode_autopsy(ckpt):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerfca_tpu.train import step as step_mod
    from nerfca_tpu.train.trainer import prepare_composite
    from nerfca_tpu.train.step import (
        composite_loss_fn, composite_forward, field_window, loss_weights,
        sample_ray_batch, jitter_directions, schedule_from_hp,
        _fused_loss_metrics_grads, _fused_rays_per_tile,
    )
    from nerfca_tpu.ops.sampling import stratify_depths
    from nerfca_tpu.ops import losses as L
    from tpu_ccta_surrogate import build

    args = build(6000)
    args.platform = "cpu"
    args.resume_from = ckpt
    setup = prepare_composite(args)
    state = setup["state"]
    dd = setup["device_data"]
    hp, cfgs = setup["hp"], setup["cfgs"]
    hull = setup["hull"]
    print("state.step =", int(state.step))

    rng, k_sample, k_depth, k_fine = jax.random.split(state.rng, 4)
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
    sched = schedule_from_hp(hp)
    step = state.step

    # (a) XLA-path full grads
    def lf(p):
        return composite_loss_fn(
            p, batch, z, step, cfgs, hp, sched=sched, hull=hull
        )

    (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
    print("\n[XLA path] loss =", float(loss))
    print(json.dumps(grad_stats(grads), indent=1))

    # (b) fused-path full grads (interpret mode on CPU)
    rt = _fused_rays_per_tile(hp, setup["depth_values"].shape[0])
    from nerfca_tpu.ops.pallas.fused_train import fused_train_loss_and_grads
    try:
        floss, fmetrics, fgrads = _fused_loss_metrics_grads(
            state.params, batch, z, step, cfgs, hp, sched,
            fused_train_loss_and_grads, rt, hull=hull,
        )
        print("\n[fused path] loss =", float(floss))
        print(json.dumps(grad_stats(fgrads), indent=1))
    except Exception as e:
        print("\n[fused path] FAILED:", e)

    # (c) per-raw-term grads through the XLA forward
    def term_fns(p):
        windows = {
            "static": field_window(cfgs["static"], step),
            "temp": field_window(cfgs["temp"], step),
        }
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
        from nerfca_tpu.ops.losses import weighted_mse
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

    names = list(term_fns(state.params))
    w = loss_weights(step, hp, sched)
    print("\n[weights]", json.dumps({k: float(v) for k, v in w.items()}))
    for name in names:
        g = jax.grad(lambda p: term_fns(p)[name])(state.params)
        print(f"\n[term {name}] value = {float(term_fns(state.params)[name]):.6g}")
        print(json.dumps(grad_stats(g), indent=1))


if __name__ == "__main__":
    if sys.argv[1] == "train":
        mode_train()
    else:
        mode_autopsy(sys.argv[2])
