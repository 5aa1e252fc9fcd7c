"""Loss/regularizer golden tests (reference: ``train/model_helpers.py:189-289``)."""

import jax.numpy as jnp
import numpy as np

from nerfca_tpu.ops.losses import (
    blend_ratio,
    blendw_entropy_loss,
    composite_losses,
    occlusion_loss,
    ray_entropy_loss,
    weighted_mse,
)
from nerfca_tpu.ops.schedules import exp_param_decay, linear_param_decay


def test_blend_ratio():
    s = jnp.array([[1.0, 3.0]])
    d = jnp.array([[1.0, 1.0]])
    blendw, smax, dmax = blend_ratio(s, d)
    np.testing.assert_allclose(np.asarray(blendw), [[0.5, 0.25]], atol=1e-6)
    assert float(smax) == 3.0 and float(dmax) == 1.0


def test_blendw_entropy_extremes():
    # blendw = 0.5 -> max binary entropy log 2; blendw ~ 0 or 1 -> ~0
    assert np.isclose(float(blendw_entropy_loss(jnp.full((4, 8), 0.5))), np.log(2), atol=1e-6)
    assert float(blendw_entropy_loss(jnp.full((4, 8), 1e-25))) < 1e-3
    near_one = float(blendw_entropy_loss(jnp.full((4, 8), 1.0)))
    assert near_one < 1e-3


def test_blendw_entropy_skewness():
    b = jnp.full((2, 4), 0.8)
    plain = float(blendw_entropy_loss(b, skewness=1.0))
    # skew 2: 0.64 is closer to 0.5 -> higher entropy
    skewed = float(blendw_entropy_loss(b, skewness=2.0))
    assert skewed > plain


def test_ray_entropy_uniform_vs_peaked():
    dists = jnp.ones(8)
    uniform = jnp.full((1, 8), 1.0)
    peaked = jnp.array([[10.0, 1e-8, 1e-8, 1e-8, 1e-8, 1e-8, 1e-8, 1e-8]])
    e_u, _ = ray_entropy_loss(uniform, dists, mask_threshold=0.0)
    e_p, _ = ray_entropy_loss(peaked, dists, mask_threshold=0.0)
    assert float(e_u) > float(e_p)
    np.testing.assert_allclose(float(e_u), np.log(8), atol=1e-3)


def test_ray_entropy_mask_threshold():
    dists = jnp.ones(4)
    sigma = jnp.array([[0.01, 0.01, 0.01, 0.01], [1.0, 1.0, 1.0, 1.0]])
    # threshold 0.1: first ray sum=0.04 masked out, second sum=4 kept
    e, ssum = ray_entropy_loss(sigma, dists, mask_threshold=0.1)
    np.testing.assert_allclose(float(e), np.log(4) / 2, atol=1e-3)
    np.testing.assert_allclose(float(ssum), (0.04 + 4.0) / 2, atol=1e-6)


def test_ray_entropy_weighted_or_mask():
    dists = jnp.ones(4)
    sigma = jnp.full((2, 4), 0.01)  # both below threshold
    wp = jnp.array([1.5, 1.0])  # first ray is high-variance
    e_off, _ = ray_entropy_loss(sigma, dists, mask_threshold=0.1)
    e_on, _ = ray_entropy_loss(
        sigma, dists, mask_threshold=0.1, use_weighting=True,
        weighted_pixs=wp, weighted_thresh=0.25,
    )
    assert float(e_off) == 0.0
    np.testing.assert_allclose(float(e_on), np.log(4) / 2, atol=1e-3)


def test_occlusion_full_ray_quirk():
    """use_back=False (shipped default): mask covers the whole ray
    (model_helpers.py:237-242)."""
    dists = jnp.ones(10)
    sigma = jnp.ones((3, 10))
    loss = occlusion_loss(sigma, dists, reg_perc=0.1, use_back=False)
    np.testing.assert_allclose(float(loss), 10.0, atol=1e-6)


def test_occlusion_front_back_mask():
    dists = jnp.ones(10)
    sigma = jnp.ones((2, 10))
    # cumsum = 1..10; front: cum < 2 -> idx 0; back: cum > 8 -> idx 8, 9
    loss = occlusion_loss(sigma, dists, reg_perc=0.2, use_back=True)
    np.testing.assert_allclose(float(loss), 3.0, atol=1e-6)


def test_weighted_mse():
    out = weighted_mse(jnp.array([2.0, 3.0]), jnp.array([1.0, 1.0]), jnp.array([1.0, 2.0]))
    np.testing.assert_allclose(np.asarray(out), [1.0, 8.0])


def test_composite_losses_bundle():
    r, s = 6, 12
    rng = np.random.default_rng(0)
    sigma_s = jnp.asarray(rng.uniform(0, 0.02, (r, s)).astype(np.float32))
    sigma_d = jnp.asarray(rng.uniform(0, 0.02, (r, s)).astype(np.float32))
    dists = jnp.full((s,), 0.01)
    wp = jnp.ones((r,))
    out = composite_losses(
        sigma_s, sigma_d, dists, wp,
        skewness_val=1.0, entro_mask_thre=1e-4,
        entro_use_weighting=True, entro_weighted_thresh=0.03,
        occl_reg_perc=0.2,
    )
    # static l1/l2 are SUM-reduced over rays (model_helpers.py:256-257)
    np.testing.assert_allclose(
        float(out.static_l1_loss), np.asarray(sigma_s * dists).sum(), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out.static_l2_loss),
        (np.asarray(sigma_s * dists) ** 2).sum(-1).sum(),
        rtol=1e-5,
    )
    assert np.isfinite(float(out.favor_s_loss))
    assert 0 <= float(out.blendw_mean) <= 1


def test_linear_param_decay():
    # before delay -> 0
    assert float(linear_param_decay(10, 1e-8, 1e-4, 1000, delay_steps=100)) == 0.0
    # at delay -> start
    np.testing.assert_allclose(
        float(linear_param_decay(100, 1e-8, 1e-4, 1000, delay_steps=100)), 1e-8
    )
    # midpoint
    np.testing.assert_allclose(
        float(linear_param_decay(600, 0.0, 1.0, 1000, delay_steps=100)), 0.5, atol=1e-6
    )
    # past the ramp -> end
    np.testing.assert_allclose(
        float(linear_param_decay(5000, 1e-8, 1e-4, 1000, delay_steps=100)), 1e-4
    )


def test_exp_param_decay():
    assert float(exp_param_decay(5, 1.0, 0.01, 100, delay_steps=10)) == 0.0
    np.testing.assert_allclose(float(exp_param_decay(0, 1.0, 0.01, 100)), 1.0)
    np.testing.assert_allclose(float(exp_param_decay(500, 1.0, 0.01, 100)), 0.01)
    # equal start/end short-circuits
    np.testing.assert_allclose(float(exp_param_decay(50, 0.3, 0.3, 100)), 0.3)
    # reference quirk: exponent = step/(steps-1)
    np.testing.assert_allclose(
        float(exp_param_decay(50, 1.0, 0.01, 101)), 1.0 * (0.01) ** (50 / 100), rtol=1e-5
    )
