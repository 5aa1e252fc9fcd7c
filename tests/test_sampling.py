"""Depth sampling tests (reference: ``train/model_helpers.py:3-12,162-187``)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfca_tpu.ops.sampling import linspace_depths, sample_pdf, stratify_depths


def test_linspace_depths():
    z = np.asarray(linspace_depths(2.0, 6.0, 5))
    np.testing.assert_allclose(z, [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-6)


def test_stratify_stays_in_intervals():
    z = linspace_depths(1.0, 2.0, 64)
    zr = np.asarray(stratify_depths(jax.random.PRNGKey(3), z))
    # monotone and bounded by the original range
    assert (np.diff(zr) > 0).all()
    assert zr[0] >= 1.0 and zr[-1] <= 2.0
    # each sample stays within its midpoint interval
    zn = np.asarray(z)
    mids = 0.5 * (zn[1:] + zn[:-1])
    lower = np.concatenate([[zn[0]], mids])
    upper = np.concatenate([mids, [zn[-1]]])
    assert (zr >= lower - 1e-6).all() and (zr <= upper + 1e-6).all()


def test_stratify_randomizes():
    z = linspace_depths(0.0, 1.0, 32)
    a = np.asarray(stratify_depths(jax.random.PRNGKey(0), z))
    b = np.asarray(stratify_depths(jax.random.PRNGKey(1), z))
    assert not np.allclose(a, b)


def test_sample_pdf_concentrates_mass():
    """Weights peaked on one bin should place nearly all samples there."""
    r, b, n = 4, 64, 256
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, b), (r, b))
    weights = np.full((r, b - 1), 1e-6, np.float32)
    weights[:, 30] = 100.0  # mass in bin interval [30/63, 31/63]... cdf idx 31
    samples = np.asarray(
        sample_pdf(jax.random.PRNGKey(0), bins, jnp.asarray(weights), n)
    )
    assert samples.shape == (r, n)
    target = 31 / 63  # cdf jumps at entry 31 -> samples land near bins[30..31]
    frac_near = (np.abs(samples - target) < 2 / 63).mean()
    assert frac_near > 0.95


def test_sample_pdf_uniform_weights_uniform_samples():
    r, b, n = 2, 32, 4096
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, b), (r, b))
    weights = jnp.ones((r, b - 1))
    samples = np.asarray(sample_pdf(jax.random.PRNGKey(7), bins, weights, n))
    assert samples.min() >= 0.0 and samples.max() <= 1.0
    # roughly uniform: mean ~ 0.5, std ~ 1/sqrt(12)
    np.testing.assert_allclose(samples.mean(), 0.5, atol=0.02)
    np.testing.assert_allclose(samples.std(), 1 / np.sqrt(12), atol=0.02)


def test_sample_pdf_jittable():
    f = jax.jit(lambda k, b, w: sample_pdf(k, b, w, 16))
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 8), (3, 8))
    out = f(jax.random.PRNGKey(0), bins, jnp.ones((3, 7)))
    assert out.shape == (3, 16)
