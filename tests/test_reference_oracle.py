"""Executable-oracle parity: run the ACTUAL reference implementation
(PyTorch, CPU) side by side with ours on identical weights and inputs.

These tests import the reference sources from ``/root/reference`` at test
time (skipped when absent) — nothing is copied; the reference is the
oracle. They pin the strongest form of parity: same numbers out of the
model forward, the renderer, the loss bundle, and the ray generator.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


def _load(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(name, os.path.join(REF, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    ns = types.SimpleNamespace(
        torch=torch,
        CPPN=_load("ref_cppn", "model/CPPN.py").CPPN,
        Temporal=_load("ref_temporal", "model/Temporal.py").Temporal,
        mh=_load("ref_model_helpers", "train/model_helpers.py"),
        ph=_load("ref_proj_helpers", "train/proj_helpers.py"),
    )
    return ns


def _jnp_params_from_torch(model, with_latents=False):
    """Map the reference module's weights into our pytree layout
    (torch Linear stores [out, in]; ours is [in, out])."""
    import jax.numpy as jnp

    # ``early_pts_layers += __create_layer(...)`` extends with the
    # Sequential's CHILDREN, so the ModuleList is flat [Linear, ReLU, ...]
    early = []
    for lin in model.early_pts_layers:
        if not hasattr(lin, "weight"):
            continue  # activation modules
        early.append(
            {
                "w": jnp.asarray(lin.weight.detach().numpy().T),
                "b": jnp.asarray(lin.bias.detach().numpy()),
            }
        )
    out_lin = model.output_linear[0]
    params = {
        "early": early,
        "out": {
            "w": jnp.asarray(out_lin.weight.detach().numpy().T),
            "b": jnp.asarray(out_lin.bias.detach().numpy()),
        },
    }
    if with_latents:
        params["latents"] = jnp.asarray(model.time_latents.detach().numpy())
    return params


def _model_def(**kw):
    base = dict(
        device="cpu",
        num_early_layers=2,
        num_late_layers=0,
        num_filters=32,
        num_input_channels=3,
        num_output_channels=1,
        use_bias=True,
        act_func="relu",
        pos_enc="free_windowed",
        pos_enc_basis=6,
        pos_enc_window_start=1,
    )
    base.update(kw)
    return base


def test_cppn_forward_matches_reference(ref):
    import jax.numpy as jnp

    from nerfca_tpu.models.fields import FieldConfig, apply_static_field
    from nerfca_tpu.ops.encoding import free_window_mask

    torch = ref.torch
    torch.manual_seed(0)
    model = ref.CPPN(_model_def())
    model.update_freq_mask_alpha(37, 100)  # mid-anneal window state

    pts = np.random.default_rng(0).uniform(-1, 1, (257, 3)).astype(np.float32)
    with torch.no_grad():
        ref_out = model(torch.from_numpy(pts)).numpy()

    cfg = FieldConfig(
        num_early_layers=2, num_filters=32, pos_enc="free_windowed",
        pos_enc_basis=6, pos_enc_window_start=1,
        pos_enc_window_decay_steps=100,
    )
    window = free_window_mask(6, 37, 100, 1)
    ours = apply_static_field(
        _jnp_params_from_torch(model), jnp.asarray(pts), cfg, window=window
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5)


def test_temporal_forward_composite_matches_reference(ref):
    import jax.numpy as jnp

    from nerfca_tpu.models.fields import FieldConfig, apply_temporal_field
    from nerfca_tpu.ops.encoding import free_window_mask

    torch = ref.torch
    torch.manual_seed(1)
    model = ref.Temporal(
        _model_def(num_input_times=1, use_time_latents=True, num_time_dim=4)
    )
    model.update_freq_mask_alpha(80, 100)

    rng = np.random.default_rng(1)
    pts = rng.uniform(-1, 1, (200, 3)).astype(np.float32)
    phases = rng.integers(0, 10, 200).astype(np.int64)
    with torch.no_grad():
        ref_out = model.forward_composite(
            torch.from_numpy(pts), torch.from_numpy(phases.astype(np.float32))
        ).numpy()

    cfg = FieldConfig(
        num_early_layers=2, num_filters=32, pos_enc="free_windowed",
        pos_enc_basis=6, pos_enc_window_start=1,
        pos_enc_window_decay_steps=100,
        use_time_latents=True, num_time_dim=4,
    )
    window = free_window_mask(6, 80, 100, 1)
    ours = apply_temporal_field(
        _jnp_params_from_torch(model, with_latents=True),
        jnp.asarray(pts),
        jnp.asarray(phases.astype(np.int32)),
        cfg,
        window=window,
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=2e-5)


def test_composite_renderer_matches_reference(ref):
    import jax.numpy as jnp

    from nerfca_tpu.ops.render import render_transmission_composite

    torch = ref.torch
    rng = np.random.default_rng(2)
    n, s = 64, 33
    s_raw = rng.normal(0, 2, (n, s, 1)).astype(np.float32)
    t_raw = rng.normal(0, 2, (n, s, 1)).astype(np.float32)
    i0 = np.full((n,), 2.16, np.float32)
    z = np.linspace(3.6, 5.4, s).astype(np.float32)
    dirs = rng.normal(0, 1, (n, 3)).astype(np.float32)

    for act in ("softplus", "sigmoid", "clamp"):
        with torch.no_grad():
            r_pix, r_ss, r_ts, r_d = ref.mh.render_volume_density_composite(
                torch.from_numpy(s_raw), torch.from_numpy(t_raw),
                torch.from_numpy(i0), torch.from_numpy(dirs),
                torch.from_numpy(z), act,
            )
        pix, ss, ts, d = render_transmission_composite(
            jnp.asarray(s_raw), jnp.asarray(t_raw), jnp.asarray(i0),
            jnp.asarray(z), act,
        )
        np.testing.assert_allclose(np.asarray(pix), r_pix.numpy(), atol=1e-5, err_msg=act)
        np.testing.assert_allclose(np.asarray(ss), r_ss.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ts), r_ts.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(d), r_d.numpy(), atol=1e-7)


def test_compute_losses_matches_reference(ref):
    import argparse

    import jax.numpy as jnp

    from nerfca_tpu.ops.losses import composite_losses

    torch = ref.torch
    rng = np.random.default_rng(3)
    n, s = 48, 21
    sigma_s = (rng.random((n, s)) * 0.4).astype(np.float32)
    sigma_d = (rng.random((n, s)) * 0.2).astype(np.float32)
    # dists is the SHARED 1-D per-sample vector, as the renderer produces it
    dists = (rng.random(s) * 0.1 + 0.01).astype(np.float32)
    weighted = (1 + rng.random(n) * 0.8).astype(np.float32)
    run_args = argparse.Namespace(
        favor_s_opt=0, skewness_val=1.5, entro_mask_thre=1e-3,
        entro_use_weighting=True, entro_weighted_thresh=0.25,
        occl_reg_perc=0.2,
    )
    with torch.no_grad():
        r = ref.mh.compute_losses(
            torch.from_numpy(sigma_s), torch.from_numpy(sigma_d),
            torch.from_numpy(dists), torch.from_numpy(weighted), run_args,
        )
    (r_blendw, r_smax, r_dmax, r_favor, r_sent, r_ssum, r_dent, r_dsum,
     r_occl, r_l1, r_l2) = [float(v) for v in r]

    ours = composite_losses(
        jnp.asarray(sigma_s), jnp.asarray(sigma_d), jnp.asarray(dists),
        jnp.asarray(weighted),
        skewness_val=1.5, entro_mask_thre=1e-3, entro_use_weighting=True,
        entro_weighted_thresh=0.25, occl_reg_perc=0.2,
    )
    np.testing.assert_allclose(float(ours.blendw_mean), r_blendw, rtol=1e-5)
    np.testing.assert_allclose(float(ours.sigma_s_max), r_smax, rtol=1e-6)
    np.testing.assert_allclose(float(ours.sigma_d_max), r_dmax, rtol=1e-6)
    np.testing.assert_allclose(float(ours.favor_s_loss), r_favor, rtol=1e-5)
    np.testing.assert_allclose(float(ours.static_entropy_loss), r_sent, rtol=1e-5)
    np.testing.assert_allclose(float(ours.static_entropy_sum), r_ssum, rtol=1e-5)
    np.testing.assert_allclose(float(ours.dynamic_entropy_loss), r_dent, rtol=1e-5)
    np.testing.assert_allclose(float(ours.dynamic_entropy_sum), r_dsum, rtol=1e-5)
    np.testing.assert_allclose(float(ours.dynamic_occl_loss), r_occl, rtol=1e-5)
    np.testing.assert_allclose(float(ours.static_l1_loss), r_l1, rtol=1e-5)
    np.testing.assert_allclose(float(ours.static_l2_loss), r_l2, rtol=1e-5)


def test_ray_generation_matches_reference(ref):
    from nerfca_tpu.geometry.rays import detector_rays

    geo = {
        "DSO": 4.5,
        "DSD": 25.0,
        "nDetector": [16, 16],
        "dDetector": [0.01, 0.01],
        "offDetector": [0.002, -0.003],
    }
    for theta, phi in ((0.0, 0.0), (-30.0, 30.0), (60.0, -30.0), (90.0, 0.0)):
        # the reference converts to radians internally
        # (get_rotation_matrix_tigre, proj_helpers.py:49-56)
        r_o, r_d = ref.ph.get_ray_values_tigre(theta, phi, 0.0, geo, "cpu")
        o, d = detector_rays(theta, phi, 0.0, geo)
        np.testing.assert_allclose(
            np.asarray(o), r_o, atol=1e-5, err_msg=f"origins {theta},{phi}"
        )
        np.testing.assert_allclose(
            np.asarray(d), r_d, atol=1e-5, err_msg=f"dirs {theta},{phi}"
        )


def test_sample_pdf_matches_reference_with_injected_uniforms(ref):
    """Inverse-CDF sampling: identical bins/weights/uniforms -> identical
    samples (searchsorted sides, gather clamping, denom guard)."""
    from unittest import mock

    import jax.numpy as jnp

    from nerfca_tpu.ops.sampling import sample_pdf

    torch = ref.torch
    rng = np.random.default_rng(4)
    r, b, n = 16, 31, 12
    bins = np.sort(rng.uniform(3.6, 5.4, (r, b)).astype(np.float32), axis=-1)
    weights = (rng.random((r, b - 1)) ** 3).astype(np.float32)
    u = rng.random((r, n)).astype(np.float32)

    with mock.patch.object(
        ref.mh.torch, "rand", lambda *shape, **kw: torch.from_numpy(
            u.reshape([s for dim in shape for s in (dim if isinstance(dim, list) else [dim])])
        )
    ):
        ref_out = ref.mh.sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), n, "cpu"
        ).numpy()

    ours = sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights), n,
                      u=jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=1e-5)


def test_composite_forward_pipeline_matches_reference(ref):
    """End-to-end coarse pipeline oracle: identical models, rays, phases,
    and (injected) depth jitter -> identical pixel predictions, sigmas, and
    dists through obtain_train_predictions_iter vs composite_forward."""
    from unittest import mock

    import jax.numpy as jnp

    from nerfca_tpu.train.step import CompositeHParams, composite_forward

    torch = ref.torch
    torch.manual_seed(5)
    static_m = ref.CPPN(_model_def())
    temp_m = ref.Temporal(
        _model_def(num_input_times=1, use_time_latents=True, num_time_dim=4)
    )
    static_m.update_freq_mask_alpha(50, 100)
    temp_m.update_freq_mask_alpha(50, 100)

    rng = np.random.default_rng(6)
    r, s = 32, 24
    origins = np.full((r, 3), [4.5, 0, 0], np.float32)
    dirs = (np.array([-1.0, 0, 0]) + rng.normal(0, 0.02, (r, 3))).astype(np.float32)
    phases = rng.integers(0, 10, r).astype(np.int32)
    i0 = np.full((r,), 2.16, np.float32)
    z_base = np.linspace(3.6, 5.4, s).astype(np.float32)
    jitter = rng.random(s).astype(np.float32)

    with mock.patch.object(
        ref.mh.torch, "rand",
        lambda *shape, **kw: torch.from_numpy(jitter),
    ):
        (r_pix, r_ss, r_ts, r_d, *_fine) = ref.mh.obtain_train_predictions_iter(
            static_m, temp_m, None, None,
            torch.from_numpy(origins), torch.from_numpy(dirs),
            torch.from_numpy(np.tile(phases[:, None], (1, s)).astype(np.float32)),
            torch.from_numpy(i0), torch.from_numpy(z_base),
            "softplus", 32768, 0, "cpu",
        )

    # reproduce the jittered depths the patched torch.rand produced
    mids = 0.5 * (z_base[1:] + z_base[:-1])
    upper = np.concatenate([mids, z_base[-1:]])
    lower = np.concatenate([z_base[:1], mids])
    z = lower + (upper - lower) * jitter

    from nerfca_tpu.models.fields import FieldConfig

    cfg_kw = dict(
        num_early_layers=2, num_filters=32, pos_enc="free_windowed",
        pos_enc_basis=6, pos_enc_window_start=1,
        pos_enc_window_decay_steps=100,
    )
    cfgs = {
        "static": FieldConfig(**cfg_kw),
        "temp": FieldConfig(use_time_latents=True, num_time_dim=4, **cfg_kw),
    }
    params = {
        "static": _jnp_params_from_torch(static_m),
        "temp": _jnp_params_from_torch(temp_m, with_latents=True),
    }
    hp = CompositeHParams(img_sample_size=r, depth_samples_coarse=s)
    from nerfca_tpu.train.step import field_window

    windows = {
        "static": field_window(cfgs["static"], 50),
        "temp": field_window(cfgs["temp"], 50),
    }
    batch = {
        "origins": jnp.asarray(origins),
        "directions": jnp.asarray(dirs),
        "phases": jnp.asarray(phases),
        "initial_intensities": jnp.asarray(i0),
    }
    fwd = composite_forward(params, batch, jnp.asarray(z), windows, cfgs, hp)

    np.testing.assert_allclose(
        np.asarray(fwd["pix_coarse"]), r_pix.detach().numpy(), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fwd["static_sigma_coarse"]), r_ss.detach().numpy(), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(fwd["temp_sigma_coarse"]), r_ts.detach().numpy(), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(fwd["dists_coarse"]), r_d.detach().numpy(), atol=1e-7
    )
