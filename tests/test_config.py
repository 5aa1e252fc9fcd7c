"""Config-surface tests: txt parsing, precedence, reference-config
compatibility (``train/data_helpers.py:10-127``)."""

import pytest

from nerfca_tpu.train.config import overwrite_args, parse_args, read_config_file


def test_defaults_parse():
    args = parse_args([])
    assert args.num_input_channels == 3
    assert args.batch_size == 32768
    assert args.output_activation == "Softplus"
    assert args.img_sample_size == 64**2
    assert args.use_time_latents is True


def test_config_file_overrides_defaults(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text(
        "lr = 1e-3\nimg_sample_size = 1024\nuse_time_latents = true\n"
        "static_pos_enc = free_windowed\noccl_reg_perc = 0.2\n"
        "data_name = MAGIX-LCA\n"
    )
    args = parse_args(["--config", str(cfg)])
    assert args.lr == pytest.approx(1e-3)
    assert args.img_sample_size == 1024
    assert args.occl_reg_perc == pytest.approx(0.2)
    assert args.data_name == "MAGIX-LCA"


def test_cli_beats_config_file(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("lr = 1e-3\nn_iters = 5000\n")
    args = parse_args(["--config", str(cfg), "--lr", "5e-4"])
    assert args.lr == pytest.approx(5e-4)
    assert args.n_iters == 5000


def test_bool_parsing(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("debug_mode = True\nentro_use_weighting = FALSE\n")
    args = parse_args(["--config", str(cfg)])
    assert args.debug_mode is True
    assert args.entro_use_weighting is False
    args2 = parse_args(["--use_wandb", "true"])
    assert args2.use_wandb is True


def test_comments_and_quotes(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text(
        "# full-line comment\n"
        "data_name = 'XCAT-V1'  # trailing comment\n"
        "weighted_loss = \"var\"\n\n"
    )
    vals = read_config_file(str(cfg))
    assert vals == {"data_name": "XCAT-V1", "weighted_loss": "var"}


def test_none_typed_flags(tmp_path):
    cfg = tmp_path / "c.txt"
    cfg.write_text("data_numb_angles = None\ndata_limited_range_test = none\n")
    args = parse_args(["--config", str(cfg)])
    assert args.data_numb_angles is None
    assert args.data_limited_range_test is None
    args2 = parse_args(["--data_numb_angles", "4"])
    assert args2.data_numb_angles == 4


def test_shipped_configs_parse():
    for name in ("configs/composite.txt", "configs/3d.txt", "configs/synth-small.txt"):
        args = parse_args(["--config", name])
        assert args.output_activation == "softplus"
    comp = parse_args(["--config", "configs/composite.txt"])
    assert comp.n_iters == 200000
    assert comp.img_sample_size == 1024
    assert comp.depth_samples_per_ray_coarse == 500
    assert comp.static_pos_enc == "free_windowed"
    assert comp.favor_s_weight_delay_steps == 40000
    assert comp.var_sample_perc == 50


def test_reference_composite_config_drives_us():
    """The reference's own composite.txt must parse through our surface."""
    args = parse_args(["--config", "/root/reference/train/composite.txt"])
    assert args.data_name == "MAGIX-LCA"
    assert args.lr == pytest.approx(1e-3)
    assert args.lr_decay_steps == 150000
    assert args.temp_pos_enc_basis == 12
    assert args.entro_use_weighting is True
    assert args.skewness_val == pytest.approx(1.0)
    assert args.l1_weight_end == pytest.approx(1e-15)


def test_reference_3d_config_drives_us():
    args = parse_args(["--config", "/root/reference/train/3d.txt"])
    assert args.data_name == "XCAT-V1"
    assert args.static_pos_enc_window_decay_steps == 80000
    assert args.occl_weight_start == pytest.approx(1e-4)


def test_overwrite_args():
    args = parse_args([])
    new = overwrite_args(args, {"lr": 0.5, "data_name": "X"})
    assert new.lr == 0.5 and new.data_name == "X"
    assert args.lr != 0.5  # original untouched


def test_overwrite_args_rejects_lossy_int_coercion():
    args = parse_args([])
    # integral string -> int attr is fine
    new = overwrite_args(args, {"n_iters": "500"})
    assert new.n_iters == 500 and isinstance(new.n_iters, int)
    # fractional string -> int attr must raise, not truncate to 0
    with pytest.raises(ValueError, match="fractional"):
        overwrite_args(args, {"n_iters": "0.5"})
    # non-numeric strings pass through untouched
    new = overwrite_args(args, {"lr": "not-a-number"})
    assert new.lr == "not-a-number"
