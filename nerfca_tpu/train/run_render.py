"""Novel-view rendering CLI: serve arbitrary (theta, phi, phase) views from
a checkpoint.

The reference has no inference/serving path at all — "inference" is the
in-loop test render (SURVEY §1). This driver renders any requested C-arm
angles and cardiac phases from a trained model:

    python -m nerfca_tpu.train.run_render --config configs/composite.txt \
        --resume_from cases/SYNTH/runs/<ts>/checkpoint \
        --render_views "-30,30,0;60,-30,5" --render_spin 8

``--render_views``: semicolon-separated ``theta,phi,phase`` triplets.
``--render_spin N``: additionally render N views sweeping theta over
[-60, 60] at phi=0 through the full cardiac cycle (a rotating-gantry cine).
Outputs composite + decomposed static/dynamic PNGs and npy arrays.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

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
    field_configs_from_args,
    resolve_pallas_support,
)


def parse_views(spec: str) -> list[tuple[float, float, int]]:
    views = []
    for part in spec.split(";"):
        part = part.strip()
        if not part:
            continue
        theta, phi, phase = part.split(",")
        views.append((float(theta), float(phi), int(phase)))
    return views


def render_views(args, views: list[tuple[float, float, int]]) -> list[dict]:
    paths = dataset_paths(args, args.data_root)
    with open(paths.general) as f:
        info = json.load(f)

    try:
        cfgs = load_field_configs(args.resume_from)
    except (OSError, KeyError):
        cfgs = field_configs_from_args(args)
    hp = composite_hparams_from_args(args)
    hp = resolve_pallas_support(hp, cfgs)
    tx = make_optimizer(args.lr, args.lr_end_factor, args.lr_decay_steps)
    state = load_checkpoint(
        args.resume_from, _init_composite_state(args, cfgs, tx), params_only=True
    )
    step = int(state.step)

    w, h = (int(v) for v in info["nDetector"])
    depth_values = linspace_depths(
        info["near_thresh"], info["far_thresh"], args.depth_samples_per_ray_coarse
    )
    # gate exactly as training did: hull config from the checkpoint's
    # persisted run record (stored record wins; mismatches warn) — same
    # contract as run_eval
    from nerfca_tpu.ops.hull import apply_hull_args_record, hull_from_args

    try:
        with open(os.path.join(args.resume_from, "metadata.json")) as f:
            hull_record = json.load(f).get("run", {}).get("hull")
    except (OSError, json.JSONDecodeError):
        hull_record = None
    if hull_record is not None:
        apply_hull_args_record(args, hull_record)

    with open(paths.train) as f:
        train_frames = json.load(f)["frames"]
    hull = hull_from_args(args, train_frames, info)

    out_dir = os.path.join(args.resume_from, "renders")
    os.makedirs(out_dir, exist_ok=True)

    results = []
    for theta, phi, phase in views:
        origins, dirs = detector_rays(theta, phi, 0.0, info)
        render = evaluation.render_test_view(
            state.params,
            jnp.asarray(np.asarray(origins).reshape(-1, 3)),
            jnp.asarray(np.asarray(dirs).reshape(-1, 3)),
            jnp.full((w * h,), phase, jnp.int32),
            depth_values,
            step,
            cfgs,
            hp,
            info["max_pixel_value"],
            hull=hull,
        )
        tag = f"view-{theta}-{phi}-phase{phase}"
        arrays = {
            "composite": np.asarray(render["pix"]).reshape(w, h),
            "static": np.asarray(render["pix_static"]).reshape(w, h),
            "dynamic": np.asarray(render["pix_temp"]).reshape(w, h),
        }
        for name, img in arrays.items():
            np.save(os.path.join(out_dir, f"{tag}-{name}.npy"), img)
            _save_png(
                os.path.join(out_dir, f"{tag}-{name}.png"),
                evaluation.normalize01(img),
            )
        results.append({"theta": theta, "phi": phi, "phase": phase, "tag": tag})
        print(f"rendered {tag}")
    print(f"-> {out_dir}")
    return results


def _save_png(path, img):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, img, cmap="gray")
    except Exception:
        pass


def main(argv=None):
    args = parse_args(argv)
    views = parse_views(args.render_views) if args.render_views else []
    if args.render_spin:
        n = args.render_spin
        for i in range(n):
            theta = -60 + 120 * i / max(1, n - 1)
            views.append((round(theta, 1), 0.0, i % 10))
    if not views:
        raise SystemExit("nothing to render: pass --render_views or --render_spin")
    render_views(args, views)


if __name__ == "__main__":
    main()
