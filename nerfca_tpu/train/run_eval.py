"""Offline evaluation CLI: render held-out views from a checkpoint and
score PSNR/SSIM.

The reference ships only a commented-out ``compute_scores_static`` hook
(``train/run_nerf.py:301``) and an ``evaluate.json`` view list the training
code writes but never reads (``preprocess/datatoray.py:151-154``). This
driver makes both real:

    python -m nerfca_tpu.train.run_eval --config configs/composite.txt \
        --resume_from cases/SYNTH/runs/<ts>/checkpoint

Renders every frame in ``evaluate.json`` (composite + decomposed
static/dynamic), writes per-view PNGs and an ``eval_scores.json`` with
per-view and mean PSNR/SSIM.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerfca_tpu.data.dataset import dataset_paths
from nerfca_tpu.data.loader import denormalize_image
from nerfca_tpu.geometry.rays import detector_rays
from nerfca_tpu.ops.sampling import linspace_depths
from nerfca_tpu.train import evaluation
from nerfca_tpu.train.checkpoint import load_checkpoint, load_field_configs
from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import (
    composite_hparams_from_args,
    field_configs_from_args,
    resolve_pallas_support,
    _init_composite_state,
)
from nerfca_tpu.train.step import make_optimizer


def evaluate_checkpoint(args, write_images: bool = True) -> dict:
    """Score a checkpoint over the full evaluate.json frame set.

    ``write_images=False`` skips the per-frame PNG panels (160 matplotlib
    writes per eval) — study scripts that eval every checkpoint are
    host-bound on those writes, not on the renders."""
    if not args.resume_from:
        raise ValueError("--resume_from <checkpoint dir> is required")

    paths = dataset_paths(args, args.data_root)
    with open(paths.general) as f:
        info = json.load(f)
    with open(paths.evaluate) as f:
        frames = json.load(f)["frames"]

    # configs from checkpoint metadata when present, else from args
    try:
        cfgs = load_field_configs(args.resume_from)
    except (OSError, KeyError):
        cfgs = field_configs_from_args(args)
    hp = composite_hparams_from_args(args)
    hp = resolve_pallas_support(hp, cfgs)

    tx = make_optimizer(args.lr, args.lr_end_factor, args.lr_decay_steps)
    example = _init_composite_state(args, cfgs, tx)
    state = load_checkpoint(args.resume_from, example, params_only=True)
    step = int(state.step)

    w, h = (int(v) for v in info["nDetector"])
    depth_values = linspace_depths(
        info["near_thresh"], info["far_thresh"], args.depth_samples_per_ray_coarse
    )
    # score the fine render too when the checkpoint carries fine models
    depth_values_fine = None
    if args.depth_samples_per_ray_fine > 0 and "static_fine" in state.params:
        depth_values_fine = linspace_depths(
            info["near_thresh"],
            info["far_thresh"],
            args.depth_samples_per_ray_fine,
        )

    # eval must gate the dynamic field exactly as training did: the hull
    # configuration is read from the checkpoint's persisted run record
    # (stored record wins; CLI mismatches warn — see apply_hull_args_record)
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

    out_dir = os.path.join(args.resume_from, "eval")
    os.makedirs(out_dir, exist_ok=True)

    scores = []
    for frame in frames:
        origins, dirs = detector_rays(frame["theta"], frame["phi"], frame["larm"], info)
        gt = denormalize_image(
            np.load(frame["file_path"]), w, h, frame["img_min_max"]
        ).astype(np.float32)
        render = evaluation.render_test_view(
            state.params,
            jnp.asarray(np.asarray(origins).reshape(-1, 3)),
            jnp.asarray(np.asarray(dirs).reshape(-1, 3)),
            jnp.full((w * h,), frame["heart_phase"], jnp.int32),
            depth_values,
            step,
            cfgs,
            hp,
            info["max_pixel_value"],
            depth_values_fine=depth_values_fine,
            hull=hull,
        )
        pred = np.asarray(render["pix"]).reshape(w, h)
        psnr = evaluation.image_psnr(pred, gt)
        lo, hi = float(gt.min()), float(gt.max())
        scale = (hi - lo) or 1.0
        ssim = evaluation.image_ssim((pred - lo) / scale, (gt - lo) / scale)
        row = {
            "image_id_str": frame["image_id_str"],
            "theta": frame["theta"],
            "phi": frame["phi"],
            "heart_phase": frame["heart_phase"],
            "psnr": psnr,
            "ssim": ssim,
        }
        if "pix_fine" in render:
            pred_f = np.asarray(render["pix_fine"]).reshape(w, h)
            row["psnr_fine"] = evaluation.image_psnr(pred_f, gt)
            row["ssim_fine"] = evaluation.image_ssim(
                (pred_f - lo) / scale, (gt - lo) / scale
            )

        # Decomposition metrics against the artery-only ground truth, when
        # the dataset provides it (SYNTH always; XCAT via the extracted
        # artery volume, preprocess/xcat.py:115-117). The temporal field's
        # predicted line integral I0 - pix_temp is compared with the raw
        # line integral of the dynamic component.
        dyn_path = frame["file_path"].replace(".npy", "-dyn.npy")
        if os.path.isfile(dyn_path):
            gt_dyn = np.load(dyn_path).reshape((w, h)).T.astype(np.float32)
            pred_dyn = info["max_pixel_value"] - np.asarray(
                render["pix_temp"]
            ).reshape(w, h)
            row["dyn_psnr"] = evaluation.image_psnr(pred_dyn, gt_dyn)
            # dyn_psnr over the whole frame rewards near-empty renders (the
            # GT is mostly zero); the masked variant scores only where the
            # vessel projects — read dyn_psnr ONLY alongside dyn_corr or
            # dyn_psnr_masked
            row["dyn_psnr_masked"] = evaluation.masked_region_psnr(
                pred_dyn, gt_dyn
            )
            dscale = float(gt_dyn.max() - gt_dyn.min()) or 1.0
            dlo = float(gt_dyn.min())
            row["dyn_ssim"] = evaluation.image_ssim(
                (pred_dyn - dlo) / dscale, (gt_dyn - dlo) / dscale
            )
            row["dyn_corr"] = _pearson(pred_dyn, gt_dyn)
            if write_images:
                _save_png(
                    os.path.join(
                        out_dir, f"{frame['image_id_str']}-dyn-gt.png"
                    ),
                    evaluation.normalize01(gt_dyn),
                )
        scores.append(row)
        if write_images:
            for name, img in (
                ("pred", pred),
                ("static", np.asarray(render["pix_static"]).reshape(w, h)),
                ("dynamic", np.asarray(render["pix_temp"]).reshape(w, h)),
            ):
                _save_png(
                    os.path.join(out_dir, f"{frame['image_id_str']}-{name}.png"),
                    evaluation.normalize01(img),
                )
        extra = (
            f" dyn_psnr={row['dyn_psnr']:.3f} dyn_corr={row['dyn_corr']:.3f}"
            if "dyn_psnr" in row
            else ""
        )
        print(f"{frame['image_id_str']}: psnr={psnr:.3f} ssim={ssim:.4f}{extra}")

    result = {
        "step": step,
        "per_view": scores,
        "mean_psnr": float(np.mean([s["psnr"] for s in scores])),
        "mean_ssim": float(np.mean([s["ssim"] for s in scores])),
        # per-view-ANGLE means (across phases): the 40-view mean hides
        # per-view structure (e.g. a lateral view that never reconstructs) —
        # report the breakdown alongside it.
        "per_view_angle": _per_angle_means(scores),
    }
    if getattr(args, "selection_view", None):
        result["selection_view"] = args.selection_view
    dyn_rows = [s for s in scores if "dyn_psnr" in s]
    if dyn_rows:
        result["mean_dyn_psnr"] = float(np.mean([s["dyn_psnr"] for s in dyn_rows]))
        result["mean_dyn_psnr_masked"] = float(
            np.mean([s["dyn_psnr_masked"] for s in dyn_rows])
        )
        result["mean_dyn_ssim"] = float(np.mean([s["dyn_ssim"] for s in dyn_rows]))
        result["mean_dyn_corr"] = float(np.mean([s["dyn_corr"] for s in dyn_rows]))
    with open(os.path.join(out_dir, "eval_scores.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(
        f"mean over {len(scores)} views: psnr={result['mean_psnr']:.3f} "
        f"ssim={result['mean_ssim']:.4f} -> {out_dir}/eval_scores.json"
    )
    return result


def _per_angle_means(scores: list[dict]) -> dict:
    groups: dict[str, list[dict]] = {}
    for s in scores:
        groups.setdefault(f"{s['theta']}-{s['phi']}", []).append(s)
    out = {}
    for key, rows in groups.items():
        entry = {
            "psnr": float(np.mean([r["psnr"] for r in rows])),
            "ssim": float(np.mean([r["ssim"] for r in rows])),
            "n_phases": len(rows),
        }
        if all("dyn_corr" in r for r in rows):
            entry["dyn_corr"] = float(np.mean([r["dyn_corr"] for r in rows]))
        out[key] = entry
    return out


_pearson = evaluation.pearson_corr


def _save_png(path, img):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, img, cmap="gray")
    except Exception:
        pass


def main(argv=None):
    evaluate_checkpoint(parse_args(argv))


if __name__ == "__main__":
    main()
