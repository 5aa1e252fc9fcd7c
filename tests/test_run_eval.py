"""Offline evaluation CLI test: train tiny -> evaluate checkpoint."""

import json
import os

import numpy as np

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.run_eval import evaluate_checkpoint
from nerfca_tpu.train.trainer import train_composite
from tests.test_trainer_integration import tiny_argv


def test_eval_from_checkpoint(tmp_path):
    args = parse_args(tiny_argv(tmp_path) + ["--n_iters", "40", "--save_every", "40",
                                             "--display_every", "40"])
    out = train_composite(args)
    ckpt = os.path.join(out["log_dir"], "checkpoint")

    eval_args = parse_args(tiny_argv(tmp_path) + ["--resume_from", ckpt])
    result = evaluate_checkpoint(eval_args)

    assert result["step"] == 41
    assert len(result["per_view"]) >= 1
    assert np.isfinite(result["mean_psnr"])
    assert -1.0 <= result["mean_ssim"] <= 1.0
    # SYNTH datasets carry artery-only ground truth -> decomposition metrics
    assert "mean_dyn_psnr" in result
    assert -1.0 <= result["mean_dyn_corr"] <= 1.0
    assert "dyn_ssim" in result["per_view"][0]
    scores_path = os.path.join(ckpt, "eval", "eval_scores.json")
    assert os.path.isfile(scores_path)
    saved = json.load(open(scores_path))
    assert saved["mean_psnr"] == result["mean_psnr"]


def test_render_cli_from_checkpoint(tmp_path):
    from nerfca_tpu.train.run_render import render_views

    args = parse_args(tiny_argv(tmp_path) + ["--n_iters", "20", "--save_every", "20",
                                             "--display_every", "20"])
    out = train_composite(args)
    ckpt = os.path.join(out["log_dir"], "checkpoint")
    args2 = parse_args(tiny_argv(tmp_path) + ["--resume_from", ckpt])
    results = render_views(args2, [(-30.0, 30.0, 0), (60.0, -30.0, 5)])
    assert len(results) == 2
    render_dir = os.path.join(ckpt, "renders")
    npys = [f for f in os.listdir(render_dir) if f.endswith(".npy")]
    # 2 views x (composite, static, dynamic)
    assert len(npys) == 6
    img = np.load(os.path.join(render_dir, npys[0]))
    assert img.shape == (50, 50)
    assert np.isfinite(img).all()


def test_eval_scores_fine_render(tmp_path):
    """With a fine-enabled checkpoint and --depth_samples_per_ray_fine set,
    offline eval also scores the fine render (psnr_fine/ssim_fine)."""
    fine = ["--depth_samples_per_ray_fine", "8"]
    args = parse_args(tiny_argv(tmp_path) + fine + [
        "--n_iters", "20", "--save_every", "20", "--display_every", "20",
    ])
    out = train_composite(args)
    ckpt = os.path.join(out["log_dir"], "checkpoint")

    eval_args = parse_args(tiny_argv(tmp_path) + fine + ["--resume_from", ckpt])
    result = evaluate_checkpoint(eval_args)
    row = result["per_view"][0]
    assert "psnr_fine" in row and np.isfinite(row["psnr_fine"])
    assert "ssim_fine" in row
