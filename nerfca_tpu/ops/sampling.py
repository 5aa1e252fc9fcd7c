"""Depth sampling along rays: uniform, stratified, and inverse-CDF (PDF).

Reference parity: ``train/data_helpers.py:167-171`` (linspace),
``train/model_helpers.py:3-12`` (stratified jitter) and
``train/model_helpers.py:162-187`` (hierarchical ``sample_pdf``).

Design note: like the reference, the stratified jitter draws ONE shared
depth vector per call — all rays in a batch share the same jittered depths
(``model_helpers.py:3-12`` operates on the 1-D depth vector). That choice is
what makes the renderer's ``dists`` 1-D and the occlusion cumsum well-formed;
it is preserved as documented behavior.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linspace_depths(near: float, far: float, n_samples: int, dtype=jnp.float32):
    """Evenly spaced depths in [near, far], shape ``[n_samples]``."""
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=dtype)
    return near * (1.0 - t) + far * t


def stratify_depths(key, z_vals):
    """Jitter depths uniformly within their midpoint intervals.

    Works on any ``[..., S]`` depth array; the reference applies it to the
    shared 1-D vector once per iteration (``model_helpers.py:3-12``).
    """
    mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
    lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
    t_rand = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    return lower + (upper - lower) * t_rand


def sample_pdf(key, bins, weights, n_samples: int, u=None):
    """Inverse-transform sample ``n_samples`` depths per ray from a piecewise
    PDF over ``bins``.

    ``bins``: ``[R, B]`` bin positions (depth midpoints), ``weights``:
    ``[R, B-1]`` unnormalized interval densities (so the CDF with its
    prepended zero has exactly ``B`` entries, aligned with ``bins``).
    Returns ``[R, n_samples]``. Matches ``train/model_helpers.py:162-187``:
    +1e-5 regularization, ``searchsorted(..., right)``, and the <1e-5
    denominator guard.

    ``u``: optional explicit uniforms ``[R, n_samples]`` (testing seam for
    oracle comparison against the reference with injected randomness).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, B+1]

    if u is None:
        u = jax.random.uniform(
            key, (*cdf.shape[:-1], n_samples), dtype=weights.dtype
        )

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    # bins has one fewer entry than cdf; clamp indices like the reference's
    # expanded gather (out-of-range 'above' only occurs where denom ~ 0).
    bmax = bins.shape[-1] - 1
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bmax), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bmax), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
