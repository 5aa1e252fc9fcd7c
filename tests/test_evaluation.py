"""In-loop eval parity tests, esp. the hierarchical fine pass: the
reference renders the FINE models on a fixed stratified fine grid and ADDS
the fine pixel + regularizer terms to ``test_loss``, overwriting the logged
regularizer components with the fine-pass values
(``run_composite.py:372-389``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerfca_tpu.models.fields import (
    FieldConfig,
    init_static_field,
    init_temporal_field,
)
from nerfca_tpu.ops.sampling import linspace_depths, stratify_depths
from nerfca_tpu.train import evaluation
from nerfca_tpu.train.step import CompositeHParams


def _setup(fine: bool):
    kw = dict(
        num_early_layers=2, num_filters=16,
        pos_enc="free_windowed", pos_enc_basis=4,
        pos_enc_window_start=1, pos_enc_window_decay_steps=200,
    )
    cfgs = {
        "static": FieldConfig(**kw),
        "temp": FieldConfig(use_time_latents=True, num_time_dim=4, **kw),
    }
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    params = {
        "static": init_static_field(ks[0], cfgs["static"]),
        "temp": init_temporal_field(ks[1], cfgs["temp"]),
    }
    if fine:
        cfgs["static_fine"] = dataclasses.replace(cfgs["static"], num_filters=8)
        cfgs["temp_fine"] = dataclasses.replace(cfgs["temp"], num_filters=8)
        params["static_fine"] = init_static_field(ks[2], cfgs["static_fine"])
        params["temp_fine"] = init_temporal_field(ks[3], cfgs["temp_fine"])
    hp = CompositeHParams(
        img_sample_size=64, depth_samples_coarse=16,
        depth_samples_fine=8 if fine else 0,
    )
    n = 64
    rng = np.random.default_rng(0)
    origins = jnp.asarray(np.full((n, 3), [4.5, 0, 0], np.float32))
    dirs = jnp.asarray(
        (np.array([-1.0, 0, 0]) + rng.normal(0, 0.02, (n, 3))).astype(np.float32)
    )
    phases = jnp.zeros((n,), jnp.int32)
    z = stratify_depths(jax.random.PRNGKey(1), linspace_depths(3.6, 5.4, 16))
    z_fine = stratify_depths(jax.random.PRNGKey(2), linspace_depths(3.6, 5.4, 8))
    gt = jnp.asarray(rng.random(n).astype(np.float32) * 0.05 + 2.1)
    return params, cfgs, hp, origins, dirs, phases, z, z_fine, gt


def test_fine_eval_changes_metrics():
    params, cfgs, hp, o, d, ph, z, z_fine, gt = _setup(fine=True)

    render_c = evaluation.render_test_view(
        params, o, d, ph, z, 10, cfgs, hp, 2.16, tile=64
    )
    assert "pix_fine" not in render_c  # no fine grid passed -> coarse only

    render_f = evaluation.render_test_view(
        params, o, d, ph, z, 10, cfgs, hp, 2.16, tile=64,
        depth_values_fine=z_fine,
    )
    for key in ("pix_fine", "static_sigma_fine", "temp_sigma_fine", "dists_fine"):
        assert key in render_f, key
    assert render_f["pix_fine"].shape == (64,)
    # coarse render identical either way
    np.testing.assert_allclose(
        np.asarray(render_c["pix"]), np.asarray(render_f["pix"]), rtol=1e-6
    )

    m_c = evaluation.test_metrics(render_c, gt, 10, hp)
    m_f = evaluation.test_metrics(render_f, gt, 10, hp)
    assert "test_pixel_loss_fine" in m_f and "test_image_psnr_fine" in m_f
    assert "test_pixel_loss_fine" not in m_c
    # fine terms add to test_loss (fine models are random-init -> nonzero)
    assert m_f["test_loss"] > m_c["test_loss"]
    assert m_f["test_pixel_loss_coarse"] == m_c["test_pixel_loss_coarse"]
    # logged regularizer components come from the FINE pass (reference
    # overwrite quirk) -> they differ from the coarse-only values
    assert m_f["test_d_entropy_loss"] != m_c["test_d_entropy_loss"]


def test_fine_eval_ignored_without_fine_params():
    params, cfgs, hp, o, d, ph, z, z_fine, gt = _setup(fine=False)
    render = evaluation.render_test_view(
        params, o, d, ph, z, 10, cfgs, hp, 2.16, tile=64,
        depth_values_fine=z_fine,
    )
    assert "pix_fine" not in render


def test_masked_region_psnr_punishes_empty_renders():
    """The BENCH.md round-3 caveat: a near-empty dynamic render scores
    >10 dB plain dyn_psnr against a mostly-zero artery GT; the masked
    variant scores only where the vessel projects, so the empty render
    drops while a correct render is unaffected."""
    import numpy as np

    from nerfca_tpu.train.evaluation import image_psnr, masked_region_psnr

    gt = np.zeros((64, 64), np.float32)
    gt[30:34, 10:50] = 1.0  # a thin bright vessel on empty background
    empty = np.zeros_like(gt)
    plain = image_psnr(empty, gt)
    masked = masked_region_psnr(empty, gt)
    assert plain > 10.0  # the weak metric rewards emptiness
    assert masked < 5.0  # the masked one does not (dilated border
    # pixels where the empty render is trivially right add ~0.3 dB)

    good = gt + np.random.default_rng(0).normal(0, 0.01, gt.shape).astype(
        np.float32
    )
    assert masked_region_psnr(good, gt) > 30.0

    # degenerate GT falls back to plain PSNR
    z = np.zeros_like(gt)
    assert masked_region_psnr(empty, z) == image_psnr(empty, z)
