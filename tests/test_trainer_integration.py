"""End-to-end driver integration: tiny synthetic dataset -> composite
training -> eval artifacts, exercising every layer at once (the TPU analog
of SURVEY §4's integration-test seam)."""

import json
import os

import numpy as np
import pytest

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_composite, train_static


def tiny_argv(tmp_path, extra=()):
    return [
        "--config", "configs/synth-small.txt",
        "--data_root", str(tmp_path / "data"),
        "--log_dir_root", str(tmp_path / "cases"),
        "--synth_vol_size", "20",
        "--depth_samples_per_ray_coarse", "48",
        "--img_sample_size", "64",
        "--steps_per_chunk", "20",
        "--n_iters", "100",
        "--display_every", "100",
        "--save_every", "100",
        "--log_every", "20",
        "--lr_decay_steps", "80",
        "--static_pos_enc_window_decay_steps", "80",
        "--temp_pos_enc_window_decay_steps", "80",
        "--hyperparam_decay_steps", "80",
        "--favor_s_weight_delay_steps", "40",
        *extra,
    ]


@pytest.fixture(scope="module")
def composite_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("run")
    args = parse_args(tiny_argv(tmp))
    out = train_composite(args)
    return tmp, args, out


def test_composite_completes_and_logs(composite_run):
    tmp, args, out = composite_run
    assert int(out["state"].step) == 101  # n_iters + 1 (range semantics)
    log_dir = out["log_dir"]
    metrics_path = os.path.join(log_dir, "metrics.jsonl")
    assert os.path.isfile(metrics_path)
    records = [json.loads(l) for l in open(metrics_path)]
    train_recs = [r for r in records if "train_loss" in r]
    test_recs = [r for r in records if "test_loss" in r]
    assert len(train_recs) >= 5
    assert len(test_recs) >= 1
    # reference metric names present
    for key in ("train_psnr", "train_blendw", "train_favor_s_loss",
                "train_d_entropy_loss", "train_s_l1", "favor_s_weight",
                "train_static_windowed", "train_time"):
        assert key in train_recs[-1], key
    for key in ("test_psnr", "test_blendw", "test_image_psnr", "test_image_ssim"):
        assert key in test_recs[-1], key
    assert np.isfinite(train_recs[-1]["train_loss"])


def test_composite_saves_checkpoint_and_config(composite_run):
    tmp, args, out = composite_run
    log_dir = out["log_dir"]
    assert os.path.isdir(os.path.join(log_dir, "checkpoint"))
    assert os.path.isfile(os.path.join(log_dir, "config.json"))
    cfg = json.load(open(os.path.join(log_dir, "config.json")))
    assert cfg["data_name"] == "SYNTH"


def test_composite_panels_written(composite_run):
    tmp, args, out = composite_run
    panels = os.listdir(os.path.join(out["log_dir"], "panels"))
    names = {p.split("-")[0] for p in panels}
    assert {"prediction", "original", "difference", "dynamic", "static"} <= {
        n.split("_")[0] for n in names
    } or len(panels) >= 5


def test_composite_resume(composite_run, tmp_path):
    tmp, args, out = composite_run
    ckpt = os.path.join(out["log_dir"], "checkpoint")
    argv = tiny_argv(tmp, extra=["--resume_from", ckpt, "--n_iters", "120"])
    args2 = parse_args(argv)
    out2 = train_composite(args2)
    assert int(out2["state"].step) == 121


def test_multi_view_selection_metric_is_mean(tmp_path):
    """With K ';'-separated selection views the in-loop metric (and the
    checkpoint-best scalar) is the MEAN over the K dedicated views, with
    per-view test_image_psnr_sel{i} logged alongside (VERDICT r4 item 5)."""
    args = parse_args(tiny_argv(
        tmp_path, extra=["--selection_view", "15,0;0,20", "--n_iters", "40",
                         "--display_every", "40", "--save_every", "40",
                         "--lr_decay_steps", "30",
                         "--static_pos_enc_window_decay_steps", "30",
                         "--temp_pos_enc_window_decay_steps", "30",
                         "--hyperparam_decay_steps", "30",
                         "--favor_s_weight_delay_steps", "10"]
    ))
    out = train_composite(args)
    records = [json.loads(l) for l in
               open(os.path.join(out["log_dir"], "metrics.jsonl"))]
    test_recs = [r for r in records if "test_image_psnr" in r]
    assert test_recs, "no eval rows logged"
    r = test_recs[-1]
    assert "test_image_psnr_sel0" in r and "test_image_psnr_sel1" in r
    assert np.isclose(
        r["test_image_psnr"],
        0.5 * (r["test_image_psnr_sel0"] + r["test_image_psnr_sel1"]),
        rtol=1e-5,
    )


def test_ccta_surrogate_trains_finite_with_hull(tmp_path):
    """The MAGIX leg must never silently NaN again (VERDICT r4 items 1+7):
    HU surrogate -> CCTA-preset dataset (``data_name`` MAGIX* picks
    ``ccta_geometry``) -> hull-gated composite train on CPU at the
    reference's 1e-19 entropy clip floor. This is the exact configuration
    that NaN'd the round-4 MAGIX-SURR run (hull far-face gather + empty-ray
    entropy VJP, both fixed in ops/hull.py / ops/losses.py); a regression
    diverges within the first chunk and fails the assertions below."""
    from nerfca_tpu.data.ccta_surrogate import write_surrogate_case

    vols = tmp_path / "vols"
    write_surrogate_case(
        str(vols), phases=3, shape=(48, 48, 32), spacing=(3.6, 3.6, 6.0),
        verbose=False,
    )
    args = parse_args(tiny_argv(tmp_path, extra=(
        "--data_name", "MAGIX-TEST",
        "--x_ray_type", "rotation",
        "--volume_root", str(vols),
        "--data_size", "50",
        "--data_time_range_end", "3",
        "--use_motion_hull", "true",
        "--n_iters", "120",
        "--save_every", "120",
    )))
    assert args.entro_clip_threshold == 1e-19  # the NaN-prone reference floor
    out = train_composite(args)
    assert out.get("diverged_at") is None, out
    records = [json.loads(l) for l in
               open(os.path.join(out["log_dir"], "metrics.jsonl"))]
    train_recs = [r for r in records if "train_loss" in r]
    assert train_recs, "no train metrics logged"
    for r in train_recs:
        assert np.isfinite(r["train_loss"]), r
        assert np.isfinite(r["train_pixel_loss_coarse"]), r


def test_static_driver(tmp_path):
    args = parse_args([
        "--config", "configs/3d.txt",
        "--data_root", str(tmp_path / "data"),
        "--log_dir_root", str(tmp_path / "cases"),
        "--data_name", "SYNTH",
        "--data_size", "50",
        "--synth_vol_size", "20",
        "--data_step_size", "120",
        "--data_numb_angles", "4",
        "--depth_samples_per_ray_coarse", "48",
        "--img_sample_size", "64",
        "--static_num_filters", "16",
        "--static_num_early_layers", "2",
        "--steps_per_chunk", "20",
        "--n_iters", "60",
        "--display_every", "60",
        "--save_every", "60",
        "--log_every", "20",
    ])
    out = train_static(args)
    assert int(out["state"].step) == 61
    records = [json.loads(l) for l in open(os.path.join(out["log_dir"], "metrics.jsonl"))]
    train_recs = [r for r in records if "train_loss" in r]
    assert train_recs and np.isfinite(train_recs[-1]["train_loss"])
    # single-phase dataset was built (run_nerf.py:61 semantics)
    assert args.data_time_range_end == args.data_time_range_start + 1


def test_sweep_local_executor(tmp_path):
    import yaml

    sweep_yaml = tmp_path / "sweep.yaml"
    yaml.safe_dump(
        {
            "method": "grid",
            "metric": {"goal": "minimize", "name": "train_loss"},
            "parameters": {"lr": {"values": [1e-3, 1e-2]}},
            "early_terminate": {"type": "hyperband", "max_iter": 40},
        },
        sweep_yaml.open("w"),
    )
    argv = tiny_argv(tmp_path, extra=["--wandb_sweep_yaml", str(sweep_yaml)])
    args = parse_args(argv)

    from nerfca_tpu.train.sweep import run_sweep
    from nerfca_tpu.train.trainer import train_composite as fn

    results = run_sweep(args, fn)
    assert len(results) == 2
    assert {r["overrides"]["lr"] for r in results} == {1e-3, 1e-2}
    assert all(r["train_loss"] is not None for r in results)
    out_path = os.path.join(str(tmp_path / "cases"), "SYNTH", "sweep_results.json")
    payload = json.load(open(out_path))
    # successive halving actually ran: rungs recorded, losers cut after
    # rung 0, the survivor promoted through max_iter=40
    hb = payload["hyperband"]
    assert hb["rung_iters"] == [4, 13, 40]
    assert len(hb["rungs"]) == 3
    assert len(hb["rungs"][0]["scores"]) == 2
    assert len(hb["rungs"][0]["promoted"]) == 1
    assert len(hb["rungs"][-1]["scores"]) == 1
    assert payload["results"][0]["train_loss"] is not None


def test_reference_config_drives_training(tmp_path):
    """The reference's own composite.txt drives our trainer end-to-end
    (data source and scale overridden to the test-size synthetic phantom)."""
    args = parse_args([
        "--config", "/root/reference/train/composite.txt",
        # swap the data source (MAGIX volumes are not present) and shrink
        "--data_name", "SYNTH",
        "--data_size", "50",
        "--synth_vol_size", "20",
        "--data_numb_angles", "4",
        "--data_time_range_start", "0",
        "--data_time_range_end", "2",
        "--depth_samples_per_ray_coarse", "48",
        "--img_sample_size", "64",
        "--temp_num_filters", "16",
        "--static_num_filters", "16",
        "--temp_num_early_layers", "1",
        "--static_num_early_layers", "1",
        "--n_iters", "30",
        "--display_every", "30",
        "--save_every", "30",
        "--log_every", "10",
        "--steps_per_chunk", "10",
        "--use_wandb", "false",
        "--data_root", str(tmp_path / "data"),
        "--log_dir_root", str(tmp_path / "cases"),
    ])
    # reference values flow through: free_windowed L=12, skew 1.0, entropy
    # weighting on, occl 0.2, lr 1e-3
    assert args.temp_pos_enc == "free_windowed"
    assert args.temp_pos_enc_basis == 12
    assert args.entro_use_weighting is True
    assert args.occl_reg_perc == 0.2
    assert args.lr == 1e-3
    out = train_composite(args)
    assert int(out["state"].step) == 31
    records = [json.loads(l) for l in open(os.path.join(out["log_dir"], "metrics.jsonl"))]
    assert any("train_loss" in r for r in records)


def test_sweep_rank_value_pushes_nan_last():
    from nerfca_tpu.train.sweep import _rank_value

    vals = [3.0, None, float("nan"), 1.0]
    ranked = sorted(vals, key=lambda v: _rank_value(v, "maximize"), reverse=True)
    assert ranked[0] == 3.0 and ranked[1] == 1.0
    ranked_min = sorted(vals, key=lambda v: _rank_value(v, "minimize"))
    assert ranked_min[0] == 1.0 and ranked_min[1] == 3.0


def test_resolve_pallas_support_downgrades_gracefully():
    """An unsupported field config (width != 128) must downgrade
    use_pallas/use_fused_loss with a warning instead of raising at trace
    time; supported configs pass through untouched."""
    import dataclasses
    import warnings

    from nerfca_tpu.models.fields import FieldConfig
    from nerfca_tpu.train.step import CompositeHParams
    from nerfca_tpu.train.trainer import resolve_pallas_support

    ok = FieldConfig(num_early_layers=2, num_filters=128)
    small = dataclasses.replace(ok, num_filters=64)
    hp = CompositeHParams(
        img_sample_size=4, depth_samples_coarse=8,
        use_pallas=True, use_fused_loss=True,
    )

    assert resolve_pallas_support(hp, {"static": ok, "temp": ok}) is hp

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = resolve_pallas_support(hp, {"static": ok, "temp": small})
    assert not out.use_pallas and not out.use_fused_loss
    assert any("envelope" in str(x.message) for x in w)

    # unsupported FINE configs keep the coarse pass fused (the forward
    # gates per-pass); only a warning about the fine fallback fires
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = resolve_pallas_support(
            hp, {"static": ok, "temp": ok, "static_fine": small}
        )
    assert out.use_pallas
    assert any("fine" in str(x.message) for x in w)

    # single-config (static trainer) form
    assert resolve_pallas_support(hp, ok) is hp
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        out = resolve_pallas_support(hp, small)
    assert not out.use_pallas

    off = dataclasses.replace(hp, use_pallas=False)
    assert resolve_pallas_support(off, {"static": small}) is off
