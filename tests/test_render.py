"""Renderer golden tests against closed-form line integrals
(reference: ``train/model_helpers.py:63-97``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerfca_tpu.ops.render import (
    depth_deltas,
    output_activation,
    render_transmission,
    render_transmission_composite,
)


def test_depth_deltas_1d():
    z = jnp.array([1.0, 1.5, 2.5, 4.0])
    d = np.asarray(depth_deltas(z))
    np.testing.assert_allclose(d, [0.5, 1.0, 1.5, 1e-10], atol=1e-12)


def test_depth_deltas_batched():
    z = jnp.stack([jnp.linspace(0, 1, 5), jnp.linspace(2, 4, 5)])
    d = np.asarray(depth_deltas(z))
    assert d.shape == (2, 5)
    np.testing.assert_allclose(d[0, :-1], 0.25, atol=1e-6)
    np.testing.assert_allclose(d[1, :-1], 0.5, atol=1e-6)
    np.testing.assert_allclose(d[:, -1], 1e-10)


def test_output_activations():
    raw = jnp.array([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(output_activation(raw, "softplus")),
        np.log1p(np.exp(np.asarray(raw))),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(output_activation(raw, "sigmoid")),
        1 / (1 + np.exp(-np.asarray(raw))),
        atol=1e-6,
    )
    clamped = np.asarray(output_activation(jnp.array([5.0]), "clamp"))
    assert clamped[0] == 1.0
    # case-insensitive (config ships 'Softplus')
    np.testing.assert_allclose(
        np.asarray(output_activation(raw, "Softplus")),
        np.asarray(output_activation(raw, "softplus")),
    )
    with pytest.raises(ValueError):
        output_activation(raw, "relu")


def test_render_constant_density_line_integral():
    """Constant sigma over [near, far] must give I0 - sigma*scale*(far-near)
    up to the dropped terminal interval."""
    n_samples, near, far = 1000, 2.0, 6.0
    z = jnp.linspace(near, far, n_samples)
    sigma_val = 0.7
    # softplus(raw) = sigma_val  =>  raw = log(exp(sigma_val) - 1)
    raw = jnp.full((4, n_samples, 1), np.log(np.exp(sigma_val) - 1.0))
    i0 = jnp.full((4,), np.log(8.670397))
    int_map, sigma, dists = render_transmission(raw, i0, z, "softplus")
    np.testing.assert_allclose(np.asarray(sigma), sigma_val, atol=1e-5)
    # integral short by one interval (last dist = 1e-10)
    expected = np.log(8.670397) - sigma_val * 1e-2 * (far - near) * (
        (n_samples - 2) / (n_samples - 1)
    ) - sigma_val * 1e-2 * (far - near) / (n_samples - 1)
    np.testing.assert_allclose(np.asarray(int_map), expected, rtol=1e-5)


def test_render_single_field_sigma_unscaled():
    z = jnp.linspace(0.0, 1.0, 10)
    raw = jnp.zeros((2, 10, 1))
    _, sigma, _ = render_transmission(raw, jnp.zeros(2), z)
    # softplus(0) = log 2, NOT multiplied by 1e-2 (model_helpers.py:91-93)
    np.testing.assert_allclose(np.asarray(sigma), np.log(2.0), atol=1e-6)


def test_render_composite_sigma_scaled_and_additive():
    z = jnp.linspace(1.0, 3.0, 50)
    raw_s = jnp.full((3, 50, 1), 0.2)
    raw_d = jnp.full((3, 50, 1), -0.4)
    i0 = jnp.full((3,), 2.0)
    int_map, s_sig, d_sig, dists = render_transmission_composite(
        raw_s, raw_d, i0, z, "softplus"
    )
    # composite sigmas carry the 1e-2 scale (model_helpers.py:77-81)
    np.testing.assert_allclose(
        np.asarray(s_sig), np.log1p(np.exp(0.2)) * 1e-2, atol=1e-6
    )
    # additivity: composite == I0 - (attn_s + attn_d)
    m_s, *_ = render_transmission(raw_s, i0, z)
    m_d, *_ = render_transmission(raw_d, i0, z)
    np.testing.assert_allclose(
        np.asarray(int_map), np.asarray(m_s + m_d - i0), atol=1e-5
    )


def test_render_zero_density_returns_i0():
    z = jnp.linspace(0.0, 5.0, 20)
    raw = jnp.full((2, 20, 1), -100.0)  # softplus ~ 0
    i0 = jnp.array([1.3, 2.7])
    int_map, _, _ = render_transmission(raw, i0, z)
    np.testing.assert_allclose(np.asarray(int_map), np.asarray(i0), atol=1e-6)


def test_render_grad_flows():
    z = jnp.linspace(1.0, 2.0, 16)

    def loss(raw):
        m, _, _ = render_transmission(raw, jnp.zeros(1), z)
        return jnp.sum(m**2)

    g = jax.grad(loss)(jnp.ones((1, 16, 1)))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
