"""Forensics: WHAT breaks when the 4-view run collapses?

Renders one held-out view decomposed (static / dynamic / composite) at a
pre-collapse and a post-collapse checkpoint of the same run, on CPU, and
localizes the error: inside vs outside the motion hull's projection, and
against the artery-only GT line integral. Also renders one TRAINING view
to separate "train fit kept improving" from "held-out broke".

Usage: python scripts/collapse_forensics.py <run_dir> <ckpt_a> <ckpt_b>
       (defaults: the batch-6 fov_hull run, 500, 3000)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from nerfca_tpu.data.loader import denormalize_image
from nerfca_tpu.data.dataset import dataset_paths
from nerfca_tpu.geometry.rays import detector_rays
from nerfca_tpu.ops.sampling import linspace_depths
from nerfca_tpu.train import evaluation
from nerfca_tpu.train.checkpoint import load_checkpoint, load_field_configs
from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.step import make_optimizer
from nerfca_tpu.train.trainer import (
    _init_composite_state,
    composite_hparams_from_args,
)
from nerfca_tpu.ops.hull import build_motion_hull, hull_gate


def main():
    run_dir = sys.argv[1] if len(sys.argv) > 1 else (
        "cases/SYNTH-FOV/runs/2026-08-17-143145-composite"
    )
    cka = sys.argv[2] if len(sys.argv) > 2 else "500"
    ckb = sys.argv[3] if len(sys.argv) > 3 else "3000"

    run_cfg = json.load(open(os.path.join(run_dir, "config.json")))
    argv = ["--config", "configs/composite.txt"]
    for k in ("data_name", "data_size", "synth_vol_size", "synth_vessel_extent",
              "synth_rib_scale", "synth_smooth_sigma", "synth_lca_val",
              "synth_vessel_radius", "synth_motion_scale"):
        if run_cfg.get(k) is not None:
            argv += [f"--{k}", str(run_cfg[k])]
    argv += ["--use_wandb", "false", "--data_root", "data", "--platform", "cpu"]
    args = parse_args(argv)
    args.use_pallas = False

    paths = dataset_paths(args, "data")
    info = json.load(open(paths.general))
    frames = json.load(open(paths.evaluate))["frames"]
    train_frames = json.load(open(paths.train))["frames"]
    w, h = (int(v) for v in info["nDetector"])
    z = linspace_depths(info["near_thresh"], info["far_thresh"], 500)

    hull = build_motion_hull(train_frames, info)
    hp = composite_hparams_from_args(args)
    tx = make_optimizer(args.lr, args.lr_end_factor, args.lr_decay_steps)

    # one held-out view at a phase with max motion + one training view
    ho = next(f for f in frames if f["theta"] == -30 and f["heart_phase"] == 5)
    tr = next(f for f in train_frames if f["heart_phase"] == 5)

    def render(ckpt_dir, frame):
        cfgs = load_field_configs(ckpt_dir)
        state = load_checkpoint(
            ckpt_dir, _init_composite_state(args, cfgs, tx), params_only=True
        )
        o, d = detector_rays(frame["theta"], frame["phi"], frame["larm"], info)
        o = jnp.asarray(np.asarray(o).reshape(-1, 3))
        d = jnp.asarray(np.asarray(d).reshape(-1, 3))
        r = evaluation.render_test_view(
            state.params, o, d,
            jnp.full((w * h,), frame["heart_phase"], jnp.int32),
            z, int(state.step), cfgs, hp, info["max_pixel_value"], hull=hull,
        )
        gt = denormalize_image(
            np.load(frame["file_path"]), w, h, frame["img_min_max"]
        ).astype(np.float32)
        gt_dyn = np.load(
            frame["file_path"].replace(".npy", "-dyn.npy")
        ).reshape(w, h).T.astype(np.float32)
        # hull projection mask: pixels whose ray crosses the hull
        from nerfca_tpu.ops.hull import hull_gate_rays
        gate = np.asarray(hull_gate_rays(hull, o, d, z))  # [n_rays, S]
        in_hull = (gate.max(axis=1) > 0.5).reshape(w, h)
        return r, gt, gt_dyn, in_hull, int(state.step)

    for tag, frame in (("HELD-OUT -30/0 ph5", ho), ("TRAIN view ph5", tr)):
        for ck in (cka, ckb):
            ckpt = os.path.join(run_dir, f"checkpoint-{ck}")
            r, gt, gt_dyn, in_hull, step = render(ckpt, frame)
            pix = np.asarray(r["pix"]).reshape(w, h)
            pix_s = np.asarray(r["pix_static"]).reshape(w, h)
            pix_t = np.asarray(r["pix_temp"]).reshape(w, h)
            i0 = info["max_pixel_value"]
            att_total = i0 - pix          # total predicted attenuation
            att_s = i0 - pix_s
            att_t = i0 - pix_t
            gt_att = i0 - gt
            gt_stat = gt_att - gt_dyn     # static-only GT attenuation
            err = (pix - gt) ** 2
            print(f"\n== {tag} checkpoint-{ck} (step {step}) ==")
            print(f" composite PSNR {evaluation.image_psnr(pix, gt):.2f}  "
                  f"static-vs-staticGT PSNR "
                  f"{evaluation.image_psnr(att_s, gt_stat):.2f}  "
                  f"dyn-vs-dynGT PSNR "
                  f"{evaluation.image_psnr(att_t, gt_dyn):.2f}")
            print(f" attenuation means: total {att_total.mean():.4f} "
                  f"(gt {gt_att.mean():.4f})  static {att_s.mean():.4f} "
                  f"(gt {gt_stat.mean():.4f})  dyn {att_t.mean():.4f} "
                  f"(gt {gt_dyn.mean():.4f})")
            print(f" err split: in-hull-projection {err[in_hull].mean():.5f} "
                  f"({in_hull.mean()*100:.0f}% of px)  outside "
                  f"{err[~in_hull].mean():.5f}")
            print(f" static sigma integral stats: att_s min {att_s.min():.3f} "
                  f"max {att_s.max():.3f}   dyn att max {att_t.max():.3f} "
                  f"(gt dyn max {gt_dyn.max():.3f})")


if __name__ == "__main__":
    main()
