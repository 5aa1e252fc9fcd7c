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


def test_ray_entropy_zero_ray_grad_finite():
    """Backward-NaN regression (MAGIX/hull failure family): a ray whose
    density is EXACTLY zero everywhere (the motion hull gates dynamic sigma
    to 0.0) used to NaN the entropy gradient at the reference's 1e-19 clip
    floor — the divide VJP computes -x/y^2 and (1e-19)^2 underflows f32, so
    the term became 0/0. The fix routes the denominator cotangent of
    near-empty rays through stop_gradient; the numerator path (g/clip, the
    reference's own magnitude) must survive on variance-masked rays."""
    import jax

    dists = jnp.full((8,), 0.01)
    wp = jnp.array([1.5, 1.0])  # ray 0 variance-masked active, ray 1 not

    def f(sig):
        e, _ = ray_entropy_loss(
            sig, dists, mask_threshold=0.1, clip_threshold=1e-19,
            use_weighting=True, weighted_pixs=wp, weighted_thresh=0.25,
        )
        return e

    sig = jnp.zeros((2, 8), jnp.float32)
    val, grad = jax.value_and_grad(f)(sig)
    assert np.isfinite(float(val))
    g = np.asarray(grad)
    assert np.isfinite(g).all()
    # the active empty ray keeps the reference's numerator gradient g/clip
    assert abs(g[0, 0]) > 1e15
    # the masked-out empty ray contributes nothing
    np.testing.assert_allclose(g[1], 0.0)
    # forward values are untouched by the guard on healthy rays
    sig_h = jnp.array([[1.0, 2.0, 0.5, 1.0, 0.2, 0.1, 3.0, 1.0]])
    e_new, _ = ray_entropy_loss(sig_h, dists, mask_threshold=0.0,
                                clip_threshold=1e-19)
    sd = np.asarray(sig_h) * 0.01
    p = sd / sd.sum()
    want = -(p * np.log(p + 1e-10)).sum()
    np.testing.assert_allclose(float(e_new), want, rtol=1e-6)


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


def _ref_sigma_s_ray_loss(sigma, dists, mask_threshold, use_weighting,
                          weighted_pixs, weighted_thresh):
    """Literal numpy transcription of the reference's
    compute_sigma_s_ray_loss (model_helpers.py:206-224), including the
    flatten-order OR-in that writes the weighted mask over only the first
    weighted_pixs.shape[0] entries of the per-ray mask."""
    sigma_dist = sigma * dists
    sigma_sum = sigma_dist.sum(-1, keepdims=True)
    mask = np.where(sigma_sum < mask_threshold, 0.0, 1.0).flatten().astype(int)
    if weighted_pixs is not None and use_weighting:
        weighted_mask = np.zeros(mask.shape, dtype=int)
        weighted_mask[: weighted_pixs.shape[0]] = np.where(
            weighted_pixs > 1 + weighted_thresh, 1, 0
        )
        mask = np.bitwise_or(weighted_mask, mask)
    ray_p = sigma_dist / np.clip(sigma_sum, 1e-19, None)
    entropy = mask * -np.sum(ray_p * np.log(ray_p + 1e-10), axis=-1)
    return entropy.mean(), sigma_sum.mean()


def test_ray_entropy_golden_vs_reference_indexing():
    """Our per-ray OR equals the reference's flatten-order OR-in at the
    shipped shapes (weighted_pixs length == n_rays), and a short weighted
    vector padded with sub-threshold values reproduces the reference's
    zero-filled tail exactly."""
    rng = np.random.default_rng(7)
    n, s = 64, 16
    sigma = rng.random((n, s)).astype(np.float32) * 0.3
    dists = rng.random((n, s)).astype(np.float32) * 0.1 + 0.01
    w = (1.0 + rng.random(n) * 0.6).astype(np.float32)

    ref_e, ref_sum = _ref_sigma_s_ray_loss(
        sigma, dists, 0.1, True, w, 0.25
    )
    ours_e, ours_sum = ray_entropy_loss(
        jnp.asarray(sigma), jnp.asarray(dists), mask_threshold=0.1,
        use_weighting=True, weighted_pixs=jnp.asarray(w),
        weighted_thresh=0.25,
    )
    np.testing.assert_allclose(float(ours_e), ref_e, rtol=1e-5)
    np.testing.assert_allclose(float(ours_sum), ref_sum, rtol=1e-5)

    # reference semantics for a SHORT weighted vector: entries past its
    # length get weighted_mask 0 == our padding with any value <= 1+thresh
    w_short = w[: n // 2]
    ref_e2, _ = _ref_sigma_s_ray_loss(sigma, dists, 0.1, True, w_short, 0.25)
    w_padded = np.concatenate([w_short, np.ones(n - n // 2, np.float32)])
    ours_e2, _ = ray_entropy_loss(
        jnp.asarray(sigma), jnp.asarray(dists), mask_threshold=0.1,
        use_weighting=True, weighted_pixs=jnp.asarray(w_padded),
        weighted_thresh=0.25,
    )
    np.testing.assert_allclose(float(ours_e2), ref_e2, rtol=1e-5)


def test_occlusion_front_only_intent():
    """front_only=True implements the reference comment's near-camera
    intent (model_helpers.py:227-229), which the shipped use_back=False
    code path does NOT (mask_back stays all-ones, so front OR back covers
    the full ray)."""
    dists = jnp.ones(10)
    sigma = jnp.ones((3, 10))
    # cumsum = 1..10; front: cum < 2 -> index 0 only
    loss = occlusion_loss(sigma, dists, reg_perc=0.2, front_only=True)
    np.testing.assert_allclose(float(loss), 1.0, atol=1e-6)
    full = occlusion_loss(sigma, dists, reg_perc=0.2, front_only=False)
    assert float(loss) < float(full)


def test_along_ray_tv_analytic():
    """Framework extension (no reference counterpart): along-ray TV is the
    mean over rays of the L1 norm of first differences along the sample
    axis. A constant ray contributes 0; a single unit step contributes 1;
    speckle (alternating 0/1 over 5 samples) contributes 4."""
    from nerfca_tpu.ops.losses import along_ray_tv

    sigma = jnp.asarray([
        [0.7, 0.7, 0.7, 0.7, 0.7],   # smooth: TV 0
        [0.0, 0.0, 1.0, 1.0, 1.0],   # one edge: TV 1
        [0.0, 1.0, 0.0, 1.0, 0.0],   # speckle: TV 4
    ])
    np.testing.assert_allclose(float(along_ray_tv(sigma)), 5.0 / 3.0, rtol=1e-6)
    # smoothness ordering: speckle >> edge at equal total mass
    assert float(along_ray_tv(sigma[2:3])) > float(along_ray_tv(sigma[1:2]))


def test_static_tv_outside_fused_envelope():
    """A non-zero static-TV weight must fall back to the XLA path (same
    contract as the fine pass): the fused Mosaic kernel does not compute
    the TV term, so silently keeping it fused would drop the regularizer."""
    import dataclasses

    from nerfca_tpu.ops.pallas.fused_train import fused_train_supported
    from tests.test_fused_train import _setup

    _, cfgs, hp, _, _ = _setup()
    hp = dataclasses.replace(hp, use_fused_loss=True)
    assert fused_train_supported(cfgs["static"], cfgs["temp"], hp)
    hp_tv = dataclasses.replace(hp, static_tv_weight_start=1e-7,
                                static_tv_weight_end=1e-9)
    assert not fused_train_supported(cfgs["static"], cfgs["temp"], hp_tv)
