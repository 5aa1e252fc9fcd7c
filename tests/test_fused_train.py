"""Monolithic train-gradient kernel vs the composite loss + jax.grad
reference path (interpret mode on CPU; compiled validation on TPU via the
bench/step integration)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nerfca_tpu.ops.pallas.fused_field as ff
from nerfca_tpu.models.fields import (
    FieldConfig,
    init_static_field,
    init_temporal_field,
)
from nerfca_tpu.ops.encoding import free_window_mask
from nerfca_tpu.ops.sampling import linspace_depths
from nerfca_tpu.ops.pallas.fused_train import fused_train_loss_and_grads
from nerfca_tpu.train.step import (
    CompositeHParams,
    composite_loss_fn,
    loss_weights,
)


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ff, "_INTERPRET", True)


def _setup(activation="softplus", use_weighting=True, seed=0, r=4, s=37):
    kw = dict(
        num_early_layers=2, num_filters=128,
        pos_enc="free_windowed", pos_enc_basis=4,
        pos_enc_window_start=1, pos_enc_window_decay_steps=100,
    )
    cfgs = {
        "static": FieldConfig(**kw),
        "temp": FieldConfig(use_time_latents=True, num_time_dim=8, **kw),
    }
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 6)
    params = {
        "static": init_static_field(ks[0], cfgs["static"]),
        "temp": init_temporal_field(ks[1], cfgs["temp"]),
    }
    hp = CompositeHParams(
        img_sample_size=r, depth_samples_coarse=s,
        output_activation=activation,
        favor_s_weight_start=1e-3, favor_s_weight_end=1e-3,
        dynamic_entro_weight_start=1e-4, dynamic_entro_weight_end=1e-4,
        occl_weight_start=1e-4, occl_weight_end=1e-4,
        l1_weight_start=1e-6, l1_weight_end=1e-6,
        hyperparam_decay_steps=100,
        entro_mask_thre=1e-3, entro_use_weighting=use_weighting,
        entro_weighted_thresh=0.25, occl_reg_perc=0.2,
        use_pallas=True,
    )
    batch = {
        "origins": jnp.full((r, 3), jnp.asarray([4.5, 0.0, 0.0])),
        "directions": jax.random.normal(ks[2], (r, 3)) * 0.02
        + jnp.asarray([-1.0, 0.0, 0.0]),
        "pixels": jax.random.uniform(ks[3], (r,)) * 0.05 + 2.1,
        "weights": 1.0 + jax.random.uniform(ks[4], (r,)),
        "phases": jax.random.randint(ks[5], (r,), 0, 10),
        "initial_intensities": jnp.full((r,), 2.16),
    }
    z = linspace_depths(3.6, 5.4, s)
    return params, cfgs, hp, batch, z


@pytest.mark.parametrize("activation", ["softplus", "sigmoid", "clamp"])
def test_fused_train_matches_value_and_grad(activation):
    params, cfgs, hp, batch, z = _setup(activation)
    step = jnp.asarray(57)

    def ref_loss(p):
        return composite_loss_fn(p, batch, z, step, cfgs, hp)

    (ref_l, ref_m), ref_g = jax.value_and_grad(ref_loss, has_aux=True)(params)

    w = loss_weights(step, hp)
    lw = jnp.stack([w["favor_s"], w["dynamic_entro"], w["occl"], w["l1"]])
    window = free_window_mask(4, 57, 100, 1)
    loss, terms, g_s, g_t = fused_train_loss_and_grads(
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], window, window, lw, hp,
    )

    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    # every metric term matches the reference loss bundle
    for term_key, ref_key in (
        ("pixel_loss", "train_pixel_loss_coarse"),
        ("favor_s", "train_favor_s_loss"),
        ("s_entropy", "train_s_entropy_loss"),
        ("s_entropy_sum", "train_s_entropy_sum"),
        ("d_entropy", "train_d_entropy_loss"),
        ("d_entropy_sum", "train_d_entropy_sum"),
        ("occl", "train_d_occl_loss"),
        ("l1", "train_s_l1"),
        ("l2", "train_s_l2"),
        ("blendw", "train_blendw"),
        ("sigma_s_max", "train_sigma_s_max"),
        ("sigma_d_max", "train_sigma_d_max"),
    ):
        np.testing.assert_allclose(
            float(terms[term_key]), float(ref_m[ref_key]), rtol=2e-5,
            atol=1e-8, err_msg=term_key,
        )

    # gradients agree leaf-by-leaf
    fused_g = {"static": g_s, "temp": g_t}
    flat_f = jax.tree_util.tree_flatten_with_path(fused_g)[0]
    flat_r = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_g)[0]
    )
    assert len(flat_f) == len(flat_r)
    for path, a in flat_f:
        b = flat_r[jax.tree_util.keystr(path)]
        scale = max(float(jnp.abs(b).max()), 1e-10)
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 5e-4, (jax.tree_util.keystr(path), err, scale)


def test_fused_train_no_weighting_mask():
    params, cfgs, hp, batch, z = _setup(use_weighting=False)
    step = jnp.asarray(10)

    def ref_loss(p):
        return composite_loss_fn(p, batch, z, step, cfgs, hp)

    (ref_l, _), ref_g = jax.value_and_grad(ref_loss, has_aux=True)(params)
    w = loss_weights(step, hp)
    lw = jnp.stack([w["favor_s"], w["dynamic_entro"], w["occl"], w["l1"]])
    window = free_window_mask(4, 10, 100, 1)
    loss, _, g_s, g_t = fused_train_loss_and_grads(
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], window, window, lw, hp,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves({"static": g_s, "temp": g_t}),
        jax.tree.leaves(ref_g),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-8
        )


def test_fused_step_matches_standard_step():
    """The composite train STEP with use_fused_loss produces the same
    parameter trajectory as the standard value_and_grad step."""
    import dataclasses

    from nerfca_tpu.ops.sampling import linspace_depths as lsd
    from nerfca_tpu.train.step import (
        TrainState,
        make_composite_train_step,
        make_optimizer,
        make_train_chunk,
    )

    params, cfgs, hp, batch, z = _setup()
    hp = dataclasses.replace(hp, img_sample_size=8)
    tx = make_optimizer(1e-3, 0.01, 100)

    rng = np.random.default_rng(0)
    n = 64
    rays = np.zeros((n, 4, 3), np.float32)
    rays[:, 0, :] = [4.5, 0, 0]
    rays[:, 1, :] = np.array([-1.0, 0, 0]) + rng.normal(0, 0.02, (n, 3))
    rays[:, 2, :] = (2.1 + 0.05 * rng.random((n, 1))).astype(np.float32)
    rays[:, 3, :] = 1.0
    rays = jnp.asarray(rays)
    phases = jnp.asarray(rng.integers(0, 10, n).astype(np.int32))
    zbase = lsd(3.6, 5.4, hp.depth_samples_coarse)

    def run(hp_x):
        step = make_composite_train_step(cfgs, hp_x, tx, zbase, 2.16)
        chunk = jax.jit(make_train_chunk(step, 3))
        state = TrainState(
            params, tx.init(params), jnp.zeros((), jnp.int32),
            jax.random.PRNGKey(7),
        )
        return chunk(state, rays, phases, None, None)

    st_ref, m_ref = run(dataclasses.replace(hp, use_fused_loss=False))
    st_fused, m_fused = run(dataclasses.replace(hp, use_fused_loss=True))

    np.testing.assert_allclose(
        np.asarray(m_fused["train_loss"]), np.asarray(m_ref["train_loss"]),
        rtol=1e-4,
    )
    for a, b in zip(jax.tree.leaves(st_fused.params), jax.tree.leaves(st_ref.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
        )


def test_fused_train_four_rays_per_tile():
    """rays_per_tile=4 (tile 2048) matches the reference path too."""
    params, cfgs, hp, batch, z = _setup()
    step = jnp.asarray(20)

    def ref_loss(p):
        return composite_loss_fn(p, batch, z, step, cfgs, hp)

    (ref_l, _), ref_g = jax.value_and_grad(ref_loss, has_aux=True)(params)
    w = loss_weights(step, hp)
    lw = jnp.stack([w["favor_s"], w["dynamic_entro"], w["occl"], w["l1"]])
    window = free_window_mask(4, 20, 100, 1)
    loss, _, g_s, g_t = fused_train_loss_and_grads(
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], window, window, lw, hp,
        rays_per_tile=4,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    for a, b in zip(
        jax.tree.leaves({"static": g_s, "temp": g_t}), jax.tree.leaves(ref_g)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-8
        )


def test_fused_train_occl_front_only():
    """The fused kernel's caller-side occlusion mask matches the unfused
    path under --occl_front_only (near-camera intent; see
    ops/losses.py::occlusion_loss)."""
    import dataclasses

    params, cfgs, hp, batch, z = _setup()
    hp = dataclasses.replace(hp, occl_front_only=True)
    step = jnp.asarray(57)

    def ref_loss(p):
        return composite_loss_fn(p, batch, z, step, cfgs, hp)

    (ref_l, ref_m), ref_g = jax.value_and_grad(ref_loss, has_aux=True)(params)

    w = loss_weights(step, hp)
    lw = jnp.stack([w["favor_s"], w["dynamic_entro"], w["occl"], w["l1"]])
    window = free_window_mask(4, 57, 100, 1)
    loss, terms, g_s, g_t = fused_train_loss_and_grads(
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], window, window, lw, hp,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(
        float(terms["occl"]), float(ref_m["train_d_occl_loss"]), rtol=2e-5
    )
    # the masked occlusion term must differ from the full-ray quirk
    hp_full = dataclasses.replace(hp, occl_front_only=False)
    _, m_full = composite_loss_fn(params, batch, z, step, cfgs, hp_full)
    assert float(ref_m["train_d_occl_loss"]) < float(m_full["train_d_occl_loss"])

    fused_g = {"static": g_s, "temp": g_t}
    flat_f = jax.tree_util.tree_flatten_with_path(fused_g)[0]
    flat_r = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_g)[0]
    )
    for path, a in flat_f:
        b = flat_r[jax.tree_util.keystr(path)]
        scale = max(float(jnp.abs(b).max()), 1e-10)
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 5e-4, (jax.tree_util.keystr(path), err, scale)


def test_seg_sum_matches_naive_matmul_form():
    """_seg_sum (matmul per-ray sums + select-FMA broadcast-back, with a
    self-adjoint custom_vjp) must match the naive segment-matrix form
    vec @ seg^T @ seg in both value and VJP — the broadcast-back has
    exactly one contributing term per sample, so agreement is exact."""
    from nerfca_tpu.ops.pallas.fused_train import _seg_sum

    rng = np.random.default_rng(7)
    rt, s_pad, k = 4, 16, 2
    tile = rt * s_pad
    seg = jnp.asarray(np.repeat(np.eye(rt, dtype=np.float32), s_pad, axis=1))
    vec = jnp.asarray(rng.standard_normal((k, tile)), jnp.float32)

    def naive(v):
        s = jnp.einsum("rt,kt->kr", seg, v)
        return jnp.einsum("kr,rt->kt", s, seg)

    out = _seg_sum(vec, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(naive(vec)),
                               rtol=1e-6, atol=1e-6)

    # VJP: the op is linear and self-adjoint (seg^T seg symmetric)
    ct = jnp.asarray(rng.standard_normal((k, tile)), jnp.float32)
    _, vjp = jax.vjp(lambda v: _seg_sum(v, seg), vec)
    _, vjp_naive = jax.vjp(naive, vec)
    np.testing.assert_allclose(np.asarray(vjp(ct)[0]),
                               np.asarray(vjp_naive(ct)[0]),
                               rtol=1e-6, atol=1e-6)


def test_field_bwd_dh_outer_product_matches_matmul():
    """The woT outer-product dh must equal the K=8 matmul it replaced when
    the output cotangent has a single nonzero row (single-term sums are
    exact in f32)."""
    rng = np.random.default_rng(3)
    t = 64
    wo = jnp.asarray(
        np.concatenate([rng.standard_normal((1, ff.WIDTH)),
                        np.zeros((ff.GEOM_ROWS - 1, ff.WIDTH))],
                       axis=0), jnp.float32)
    woT = wo[0:1, :].T
    g0 = rng.standard_normal((1, t)).astype(np.float32)
    g = jnp.asarray(np.concatenate(
        [g0, np.zeros((ff.GEOM_ROWS - 1, t), np.float32)], axis=0))

    dh_matmul = jax.lax.dot_general(
        wo, g, (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)
    dh_outer = woT * g[0:1, :]
    np.testing.assert_array_equal(np.asarray(dh_outer),
                                  np.asarray(dh_matmul))


def test_fused_train_bf16_residuals_close():
    """--pallas_bf16_residuals stores the backward residuals (post-ReLU
    activations) in bf16. Loss/forward are unchanged (exact); gradients
    shift only by residual quantization in the dW matmuls — on hardware
    the MXU's default precision feeds those matmuls bf16 operands anyway,
    so the mode is near-neutral there."""
    import dataclasses

    params, cfgs, hp, batch, z = _setup()
    step = jnp.asarray(57)
    w = loss_weights(step, hp)
    lw = jnp.stack([w["favor_s"], w["dynamic_entro"], w["occl"], w["l1"]])
    window = free_window_mask(4, 57, 100, 1)

    args = (params["static"], params["temp"],
            batch["origins"], batch["directions"], z, batch["phases"],
            batch["pixels"], batch["weights"], batch["initial_intensities"],
            cfgs["static"], cfgs["temp"], window, window, lw)

    loss32, _, gs32, gt32 = fused_train_loss_and_grads(*args, hp)
    hp16 = dataclasses.replace(hp, pallas_bf16_residuals=True)
    loss16, _, gs16, gt16 = fused_train_loss_and_grads(*args, hp16)

    # the forward never reads the stored copies -> loss is exact
    np.testing.assert_array_equal(np.asarray(loss16), np.asarray(loss32))

    for g32, g16 in ((gs32, gs16), (gt32, gt16)):
        flat32 = jax.tree_util.tree_flatten_with_path(g32)[0]
        flat16 = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in jax.tree_util.tree_flatten_with_path(g16)[0]
        )
        gmax = max(float(jnp.abs(v).max()) for _, v in flat32)
        for path, a in flat32:
            b = flat16[jax.tree_util.keystr(path)]
            scale = max(float(jnp.abs(a).max()), 1e-2 * gmax, 1e-10)
            err = float(jnp.abs(a - b).max()) / scale
            # bf16 has ~3 decimal digits; residuals appear once per matmul
            assert err < 2e-2, (jax.tree_util.keystr(path), err, scale)


def test_fused_train_hull_zero_rays_grad_finite_and_matches():
    """Backward-NaN regression, fused-kernel side (mirrors
    tests/test_losses.py::test_ray_entropy_zero_ray_grad_finite): an
    all-zero motion hull gates every ray's dynamic density to EXACT zero;
    at the reference's 1e-19 entropy clip floor the in-kernel vjp used to
    produce NaN through the divide VJP's -x/y^2 underflow. Both paths must
    stay finite and keep agreeing with each other."""
    from nerfca_tpu.ops.hull import MotionHull

    params, cfgs, hp, batch, z = _setup()
    assert hp.entro_clip_threshold == 1e-19  # the reference default
    hull = MotionHull(
        grid=jnp.zeros((8, 8, 8), jnp.float32),
        d_voxel=jnp.full((3,), 2.0, jnp.float32),
        off=jnp.zeros((3,), jnp.float32),
    )
    step = jnp.asarray(57)

    def ref_loss(p):
        return composite_loss_fn(p, batch, z, step, cfgs, hp, hull=hull)

    (ref_l, ref_m), ref_g = jax.value_and_grad(ref_loss, has_aux=True)(params)
    assert np.isfinite(float(ref_l))
    for k, v in ref_m.items():
        assert np.isfinite(float(v)), k
    for p, leaf in jax.tree_util.tree_flatten_with_path(ref_g)[0]:
        assert np.isfinite(np.asarray(leaf)).all(), jax.tree_util.keystr(p)

    w = loss_weights(step, hp)
    lw = jnp.stack([w["favor_s"], w["dynamic_entro"], w["occl"], w["l1"],
                    jnp.float32(0.0)])
    window = free_window_mask(4, 57, 100, 1)
    loss, terms, g_s, g_t = fused_train_loss_and_grads(
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], window, window, lw, hp, hull=hull,
    )
    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    fused_g = {"static": g_s, "temp": g_t}
    for p, leaf in jax.tree_util.tree_flatten_with_path(fused_g)[0]:
        assert np.isfinite(np.asarray(leaf)).all(), jax.tree_util.keystr(p)
    # gated-to-zero dynamic field: its entropy term must be exactly zero
    np.testing.assert_allclose(float(terms["d_entropy"]), 0.0, atol=1e-12)
    np.testing.assert_allclose(
        float(terms["d_entropy"]), float(ref_m["train_d_entropy_loss"]),
        atol=1e-12,
    )


def test_fine_pass_falls_back_to_xla():
    """depth_samples_fine > 0 is OUTSIDE the fused kernel's envelope by
    permanent scope decision (the reference ships the fine hierarchy
    disabled, train/composite.txt N_importance = 0, and per-ray sorted
    fine depths need a gather the Mosaic tiling can't express) — the
    composite step must silently compose the XLA fine pass instead. See
    fused_train_supported's docstring."""
    import dataclasses

    from nerfca_tpu.ops.pallas.fused_train import fused_train_supported

    _, cfgs, hp, _, _ = _setup()
    hp = dataclasses.replace(hp, use_fused_loss=True)
    assert fused_train_supported(cfgs["static"], cfgs["temp"], hp)

    hp_fine = dataclasses.replace(hp, depth_samples_fine=16)
    assert not fused_train_supported(cfgs["static"], cfgs["temp"], hp_fine)
