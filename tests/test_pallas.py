"""Fused Pallas field kernel vs the jnp reference implementation
(interpret mode on CPU; the compiled path runs on real TPU via bench.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nerfca_tpu.ops.pallas.fused_field as ff
from nerfca_tpu.models.fields import (
    FieldConfig,
    apply_static_field,
    apply_temporal_field,
    init_static_field,
    init_temporal_field,
)
from nerfca_tpu.ops.encoding import free_window_mask


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(ff, "_INTERPRET", True)


def flagship_cfgs(basis=4, layers=2):
    kw = dict(
        num_early_layers=layers, num_filters=128,
        pos_enc="free_windowed", pos_enc_basis=basis,
        pos_enc_window_start=1, pos_enc_window_decay_steps=100,
    )
    return (
        FieldConfig(**kw),
        FieldConfig(use_time_latents=True, num_time_dim=8, **kw),
    )


def make_inputs(r=4, s=64, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    points = jax.random.uniform(k1, (r, s, 3), minval=-1.0, maxval=1.0)
    phases = jax.random.randint(k2, (r, s), 0, 10)
    return points, phases


def test_supported_configs():
    cfg_s, cfg_t = flagship_cfgs()
    assert ff.pallas_supported(cfg_s) and ff.pallas_supported(cfg_t)
    assert not ff.pallas_supported(dataclasses.replace(cfg_s, num_filters=64))
    assert not ff.pallas_supported(dataclasses.replace(cfg_s, num_late_layers=2))
    assert ff.pallas_supported(dataclasses.replace(cfg_s, pos_enc="fourier"))
    assert not ff.pallas_supported(dataclasses.replace(cfg_s, pos_enc_basis=30))
    # fourier width limit: 6*basis <= 128 -> basis 21 ok, 22 not
    assert ff.pallas_supported(
        dataclasses.replace(cfg_s, pos_enc="fourier", pos_enc_basis=21)
    )
    assert not ff.pallas_supported(
        dataclasses.replace(cfg_s, pos_enc="fourier", pos_enc_basis=22)
    )


def test_forward_matches_reference():
    cfg_s, cfg_t = flagship_cfgs()
    params_s = init_static_field(jax.random.PRNGKey(1), cfg_s)
    params_t = init_temporal_field(jax.random.PRNGKey(2), cfg_t)
    points, phases = make_inputs()
    w_s = free_window_mask(4, 37, 100, 1)
    w_t = free_window_mask(4, 37, 100, 1)

    raw_s, raw_t = ff.fused_composite_fields(
        params_s, params_t, points, phases, cfg_s, cfg_t, w_s, w_t, tile=128
    )
    ref_s = apply_static_field(params_s, points, cfg_s, window=w_s)
    ref_t = apply_temporal_field(params_t, points, phases, cfg_t, window=w_t)

    np.testing.assert_allclose(np.asarray(raw_s), np.asarray(ref_s), atol=2e-4)
    np.testing.assert_allclose(np.asarray(raw_t), np.asarray(ref_t), atol=2e-4)


def test_forward_none_encoding():
    kw = dict(num_early_layers=1, num_filters=128, pos_enc="none", pos_enc_basis=0)
    cfg_s = FieldConfig(**kw)
    cfg_t = FieldConfig(use_time_latents=True, num_time_dim=8, **kw)
    params_s = init_static_field(jax.random.PRNGKey(3), cfg_s)
    params_t = init_temporal_field(jax.random.PRNGKey(4), cfg_t)
    points, phases = make_inputs(r=2, s=64)
    raw_s, raw_t = ff.fused_composite_fields(
        params_s, params_t, points, phases, cfg_s, cfg_t, None, None, tile=128
    )
    ref_s = apply_static_field(params_s, points, cfg_s)
    ref_t = apply_temporal_field(params_t, points, phases, cfg_t)
    np.testing.assert_allclose(np.asarray(raw_s), np.asarray(ref_s), atol=2e-4)
    np.testing.assert_allclose(np.asarray(raw_t), np.asarray(ref_t), atol=2e-4)


def test_forward_padding_path():
    """Point counts that are not tile multiples are padded and unpadded."""
    cfg_s, cfg_t = flagship_cfgs(layers=1)
    params_s = init_static_field(jax.random.PRNGKey(5), cfg_s)
    params_t = init_temporal_field(jax.random.PRNGKey(6), cfg_t)
    points, phases = make_inputs(r=3, s=33)  # 99 points, tile 128
    raw_s, raw_t = ff.fused_composite_fields(
        params_s, params_t, points, phases, cfg_s, cfg_t,
        jnp.ones(4), jnp.ones(4), tile=128,
    )
    ref_s = apply_static_field(params_s, points, cfg_s, window=jnp.ones(4))
    np.testing.assert_allclose(np.asarray(raw_s), np.asarray(ref_s), atol=2e-4)
    assert raw_t.shape == (3, 33, 1)


def test_gradients_match_reference():
    cfg_s, cfg_t = flagship_cfgs(basis=2, layers=1)
    params_s = init_static_field(jax.random.PRNGKey(7), cfg_s)
    params_t = init_temporal_field(jax.random.PRNGKey(8), cfg_t)
    points, phases = make_inputs(r=2, s=64, seed=3)
    w = free_window_mask(2, 10, 100, 1)

    def loss_fused(ps, pt):
        raw_s, raw_t = ff.fused_composite_fields(
            ps, pt, points, phases, cfg_s, cfg_t, w, w, tile=128
        )
        return jnp.sum(jnp.sin(raw_s) * 0.3 + raw_t**2)

    def loss_ref(ps, pt):
        raw_s = apply_static_field(ps, points, cfg_s, window=w)
        raw_t = apply_temporal_field(pt, points, phases, cfg_t, window=w)
        return jnp.sum(jnp.sin(raw_s) * 0.3 + raw_t**2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(params_s, params_t)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params_s, params_t)

    flat_f, tree_f = jax.tree_util.tree_flatten(g_fused)
    flat_r, tree_r = jax.tree_util.tree_flatten(g_ref)
    assert tree_f == tree_r
    for a, b, path in zip(
        flat_f, flat_r,
        [str(p) for p, _ in jax.tree_util.tree_flatten_with_path(g_ref)[0]],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3, err_msg=path
        )


def test_latent_gradient_flows():
    cfg_s, cfg_t = flagship_cfgs(basis=2, layers=1)
    params_s = init_static_field(jax.random.PRNGKey(9), cfg_s)
    params_t = init_temporal_field(jax.random.PRNGKey(10), cfg_t)
    points, _ = make_inputs(r=2, s=64)
    phases = jnp.full((2, 64), 3)

    def loss(pt):
        _, raw_t = ff.fused_composite_fields(
            params_s, pt, points, phases, cfg_s, cfg_t,
            jnp.ones(2), jnp.ones(2), tile=128,
        )
        return jnp.sum(raw_t)

    g = jax.grad(loss)(params_t)
    glat = np.asarray(g["latents"])
    assert np.abs(glat[3]).sum() > 0  # used phase gets gradient
    np.testing.assert_allclose(glat[4], 0.0)  # unused phase does not


def test_fused_static_field():
    cfg_s, _ = flagship_cfgs(layers=1)
    params_s = init_static_field(jax.random.PRNGKey(11), cfg_s)
    points, _ = make_inputs(r=2, s=64)
    w = jnp.ones(4)
    raw = ff.fused_static_field(params_s, points, cfg_s, w, tile=128)
    ref = apply_static_field(params_s, points, cfg_s, window=w)
    np.testing.assert_allclose(np.asarray(raw), np.asarray(ref), atol=2e-4)


def test_train_step_with_pallas_flag():
    """The hp.use_pallas path wires through the composite step."""
    from nerfca_tpu.ops.sampling import linspace_depths
    from nerfca_tpu.train.step import (
        CompositeHParams,
        make_composite_train_step,
        make_optimizer,
        make_train_chunk,
    )
    from tests.test_train_step import make_state, synthetic_rays

    cfg_s, cfg_t = flagship_cfgs(basis=2, layers=1)
    cfgs = {"static": cfg_s, "temp": cfg_t}
    hp = CompositeHParams(
        img_sample_size=16, depth_samples_coarse=16, use_pallas=True,
    )
    tx = make_optimizer(1e-3, 1.0, 100)
    state = make_state(cfgs, tx)
    rays, phases = synthetic_rays(64)
    z = linspace_depths(3.6, 5.4, 16)
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    chunk = jax.jit(make_train_chunk(step, 2))
    state, m = chunk(
        state, rays, phases, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32)
    )
    assert np.isfinite(np.asarray(m["train_loss"])).all()


def test_ray_form_matches_point_form():
    """fused_composite_fields_rays must equal the point-form entry (and the
    jnp reference) for shared and per-ray depths."""
    import jax.numpy as jnp

    cfg_s, cfg_t = flagship_cfgs(basis=3, layers=1)
    params_s = init_static_field(jax.random.PRNGKey(20), cfg_s)
    params_t = init_temporal_field(jax.random.PRNGKey(21), cfg_t)
    r, s = 4, 32
    key = jax.random.PRNGKey(22)
    origins = jax.random.uniform(key, (r, 3), minval=-0.5, maxval=0.5)
    dirs = jax.random.uniform(jax.random.fold_in(key, 1), (r, 3), minval=-1, maxval=1)
    z = jnp.linspace(0.5, 1.5, s)
    z_rs = jnp.broadcast_to(z, (r, s))
    phases = jax.random.randint(jax.random.fold_in(key, 2), (r,), 0, 10)
    w = jnp.ones(3)

    raw_s, raw_t = ff.fused_composite_fields_rays(
        params_s, params_t, origins, dirs, z_rs, phases,
        cfg_s, cfg_t, w, w, tile=128,
    )
    pts = origins[:, None, :] + dirs[:, None, :] * z[:, None]
    ref_s = apply_static_field(params_s, pts, cfg_s, window=w)
    pph = jnp.broadcast_to(phases[:, None], (r, s))
    ref_t = apply_temporal_field(params_t, pts, pph, cfg_t, window=w)
    np.testing.assert_allclose(np.asarray(raw_s), np.asarray(ref_s), atol=3e-4)
    np.testing.assert_allclose(np.asarray(raw_t), np.asarray(ref_t), atol=3e-4)

    # per-ray depths (the fine-pass case)
    z_per_ray = z_rs + jax.random.uniform(jax.random.fold_in(key, 3), (r, 1)) * 0.1
    raw_s2, _ = ff.fused_composite_fields_rays(
        params_s, params_t, origins, dirs, z_per_ray, phases,
        cfg_s, cfg_t, w, w, tile=128,
    )
    pts2 = origins[:, None, :] + dirs[:, None, :] * z_per_ray[..., None]
    ref_s2 = apply_static_field(params_s, pts2, cfg_s, window=w)
    np.testing.assert_allclose(np.asarray(raw_s2), np.asarray(ref_s2), atol=3e-4)


def test_ray_form_gradients():
    import jax.numpy as jnp

    cfg_s, cfg_t = flagship_cfgs(basis=2, layers=1)
    params_s = init_static_field(jax.random.PRNGKey(30), cfg_s)
    params_t = init_temporal_field(jax.random.PRNGKey(31), cfg_t)
    r, s = 2, 64
    key = jax.random.PRNGKey(32)
    origins = jax.random.uniform(key, (r, 3), minval=-0.5, maxval=0.5)
    dirs = jax.random.uniform(jax.random.fold_in(key, 1), (r, 3))
    z_rs = jnp.broadcast_to(jnp.linspace(0.5, 1.5, s), (r, s))
    phases = jnp.array([2, 7])
    w = jnp.ones(2)

    def loss_fused(ps, pt):
        a, b = ff.fused_composite_fields_rays(
            ps, pt, origins, dirs, z_rs, phases, cfg_s, cfg_t, w, w, tile=128
        )
        return jnp.sum(a * 0.5 + b**2)

    def loss_ref(ps, pt):
        pts = origins[:, None, :] + dirs[:, None, :] * z_rs[..., None]
        pph = jnp.broadcast_to(phases[:, None], (r, s))
        a = apply_static_field(ps, pts, cfg_s, window=w)
        b = apply_temporal_field(pt, pts, pph, cfg_t, window=w)
        return jnp.sum(a * 0.5 + b**2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(params_s, params_t)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params_s, params_t)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3)


def test_forward_fourier_encoding():
    """Fourier mode in the kernel: diagonal per-channel scaling with no raw
    rows and no window, matching the jnp path (model/CPPN.py:115-118)."""
    kw = dict(
        num_early_layers=2, num_filters=128,
        pos_enc="fourier", pos_enc_basis=6, fourier_sigma=1.5,
    )
    cfg_s = FieldConfig(**kw)
    cfg_t = FieldConfig(use_time_latents=True, num_time_dim=8, **kw)
    params_s = init_static_field(jax.random.PRNGKey(11), cfg_s)
    params_t = init_temporal_field(jax.random.PRNGKey(12), cfg_t)
    points, phases = make_inputs(r=2, s=64)
    raw_s, raw_t = ff.fused_composite_fields(
        params_s, params_t, points, phases, cfg_s, cfg_t, None, None, tile=128
    )
    ref_s = apply_static_field(params_s, points, cfg_s)
    ref_t = apply_temporal_field(params_t, points, phases, cfg_t)
    np.testing.assert_allclose(np.asarray(raw_s), np.asarray(ref_s), atol=2e-4)
    np.testing.assert_allclose(np.asarray(raw_t), np.asarray(ref_t), atol=2e-4)


def test_gradients_fourier_encoding():
    kw = dict(
        num_early_layers=1, num_filters=128,
        pos_enc="fourier", pos_enc_basis=4, fourier_sigma=1.0,
    )
    cfg_s = FieldConfig(**kw)
    cfg_t = FieldConfig(use_time_latents=True, num_time_dim=8, **kw)
    params_s = init_static_field(jax.random.PRNGKey(13), cfg_s)
    params_t = init_temporal_field(jax.random.PRNGKey(14), cfg_t)
    points, phases = make_inputs(r=2, s=64, seed=5)

    def loss_fused(ps, pt):
        raw_s, raw_t = ff.fused_composite_fields(
            ps, pt, points, phases, cfg_s, cfg_t, None, None, tile=128
        )
        return jnp.sum(raw_s**2) + jnp.sum(raw_t * raw_s)

    def loss_ref(ps, pt):
        raw_s = apply_static_field(ps, points, cfg_s)
        raw_t = apply_temporal_field(pt, points, phases, cfg_t)
        return jnp.sum(raw_s**2) + jnp.sum(raw_t * raw_s)

    g_fused = jax.grad(loss_fused, argnums=(0, 1))(params_s, params_t)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params_s, params_t)
    for a, b in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-3
        )
