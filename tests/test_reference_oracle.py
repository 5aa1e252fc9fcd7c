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
