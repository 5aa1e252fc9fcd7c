"""Field MLP tests (reference: ``model/CPPN.py``, ``model/Temporal.py``)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfca_tpu.models.fields import (
    NUM_CARDIAC_PHASES,
    FieldConfig,
    apply_static_field,
    apply_temporal_field,
    init_static_field,
    init_temporal_field,
)
from nerfca_tpu.ops.encoding import free_window_mask


def small_cfg(**kw):
    base = dict(
        num_early_layers=2,
        num_late_layers=0,
        num_filters=16,
        pos_enc="free_windowed",
        pos_enc_basis=4,
        pos_enc_window_start=1,
    )
    base.update(kw)
    return FieldConfig(**base)


def test_static_shapes_and_param_structure():
    cfg = small_cfg()
    params = init_static_field(jax.random.PRNGKey(0), cfg)
    assert len(params["early"]) == 3  # input layer + 2 hidden
    assert params["early"][0]["w"].shape == (cfg.encoded_features, 16)
    assert params["out"]["w"].shape == (16, 1)
    assert "skip" not in params and "latents" not in params

    x = jnp.ones((32, 3)) * 0.1
    out = apply_static_field(params, x, cfg, window=jnp.ones(4))
    assert out.shape == (32, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_static_skip_architecture():
    cfg = small_cfg(num_late_layers=2)
    params = init_static_field(jax.random.PRNGKey(0), cfg)
    assert params["skip"]["w"].shape == (16 + cfg.encoded_features, 16)
    assert len(params["late"]) == 1  # num_late - 1
    out = apply_static_field(params, jnp.ones((5, 3)), cfg, window=jnp.ones(4))
    assert out.shape == (5, 1)


def test_temporal_latent_gather():
    cfg = small_cfg(use_time_latents=True, num_time_dim=8)
    params = init_temporal_field(jax.random.PRNGKey(1), cfg)
    assert params["latents"].shape == (NUM_CARDIAC_PHASES, 8)
    assert params["early"][0]["w"].shape == (cfg.encoded_features + 8, 16)

    x = jnp.zeros((6, 3))
    phases = jnp.array([0, 0, 0, 5, 5, 5])
    out = np.asarray(
        apply_temporal_field(params, x, phases, cfg, window=jnp.ones(4))
    )
    # same point, same phase -> identical; different phase -> different
    np.testing.assert_allclose(out[0], out[1])
    np.testing.assert_allclose(out[3], out[4])
    assert not np.allclose(out[0], out[3])


def test_temporal_supports_late_layers():
    """Strict superset of the reference, whose query_time breaks for
    num_late_layers > 0 (model/Temporal.py:128-136)."""
    cfg = small_cfg(use_time_latents=True, num_time_dim=4, num_late_layers=1)
    params = init_temporal_field(jax.random.PRNGKey(2), cfg)
    out = apply_temporal_field(
        params, jnp.ones((3, 3)), jnp.zeros(3, jnp.int32), cfg, window=jnp.ones(4)
    )
    assert out.shape == (3, 1)


def test_window_changes_output():
    cfg = small_cfg()
    params = init_static_field(jax.random.PRNGKey(3), cfg)
    x = jnp.full((4, 3), 0.3)
    closed = apply_static_field(
        params, x, cfg, window=free_window_mask(4, 0, 100, 0)
    )
    open_ = apply_static_field(
        params, x, cfg, window=free_window_mask(4, 100, 100, 0)
    )
    assert not np.allclose(np.asarray(closed), np.asarray(open_))


def test_fourier_mode_end_to_end():
    cfg = small_cfg(pos_enc="fourier", fourier_sigma=2.0)
    params = init_static_field(jax.random.PRNGKey(4), cfg)
    assert params["fourier"].shape == (3 * 4,)
    out = apply_static_field(params, jnp.ones((7, 3)), cfg)
    assert out.shape == (7, 1)


def test_none_encoding():
    cfg = small_cfg(pos_enc="none")
    params = init_static_field(jax.random.PRNGKey(5), cfg)
    assert params["early"][0]["w"].shape == (3, 16)
    out = apply_static_field(params, jnp.ones((2, 3)), cfg)
    assert out.shape == (2, 1)


def test_bf16_compute_close_to_f32():
    cfg = small_cfg(num_filters=32)
    params = init_static_field(jax.random.PRNGKey(6), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(7), (64, 3), minval=-1, maxval=1)
    w = jnp.ones(4)
    f32 = np.asarray(apply_static_field(params, x, cfg, window=w))
    bf16 = np.asarray(
        apply_static_field(params, x, cfg, window=w, compute_dtype=jnp.bfloat16)
    )
    np.testing.assert_allclose(f32, bf16, atol=0.05)


def test_grad_through_field():
    cfg = small_cfg(use_time_latents=True, num_time_dim=4)
    params = init_temporal_field(jax.random.PRNGKey(8), cfg)

    def loss(p):
        out = apply_temporal_field(
            p, jnp.ones((8, 3)) * 0.2, jnp.arange(8) % 10, cfg, window=jnp.ones(4)
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    # every leaf receives a finite gradient; latent rows 0..7 get signal
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
    assert np.abs(np.asarray(g["latents"][:8])).sum() > 0


def test_intermediates_api():
    cfg = small_cfg(num_late_layers=2)
    params = init_static_field(jax.random.PRNGKey(9), cfg)
    out, inter = apply_static_field(
        params, jnp.ones((4, 3)), cfg, window=jnp.ones(4), return_intermediates=True
    )
    # input layer + 2 early + skip + 1 late = 5 relu activations
    assert len(inter) == 5
    assert all(a.shape == (4, 16) for a in inter)
