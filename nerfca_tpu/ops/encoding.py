"""Positional encodings with annealed frequency windows.

The reference implements these twice (``model/CPPN.py:112-162`` and
``model/Temporal.py:153-204``) as stateful module methods whose annealing
state is mutated from the host loop each iteration. Here there is ONE
implementation, and the annealing state is a pure function of the step
counter, so the whole schedule traces into the jitted train step — no host
round-trip per iteration.

Modes (``pos_enc`` flag values, ``train/composite.txt:68-77``):
  - ``'none'``: raw coordinates.
  - ``'fourier'``: Gaussian Fourier features (``model/CPPN.py:115-118``),
    [sin(2*pi*x_tiled*B), cos(...)], no raw passthrough.
  - ``'nerfies_windowed'``: axis-aligned 2^j frequencies with the Nerfies
    cosine ease window (``model/CPPN.py:137-142``), raw coords prepended.
  - ``'free_windowed'``: FreeNeRF binary-with-fractional-edge frequency mask
    (``model/CPPN.py:144-159``), raw coords prepended. Used by all shipped
    configs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def encoded_feature_count(mode: str, basis: int, num_channels: int = 3) -> int:
    """Width of the encoded feature vector fed into the field MLP.

    Matches the reference's ``input_features`` arithmetic
    (``model/CPPN.py:30-38``).
    """
    if mode == "none" or basis == 0:
        return num_channels
    if mode == "fourier":
        return num_channels * 2 * basis
    return num_channels + num_channels * 2 * basis


def free_window_alpha(
    basis: int, step, decay_steps: int, window_start: int = 0,
    window_max: float = 0.0,
):
    """FreeNeRF moving pointer; also the value logged as ``windowed_alpha``.

    ``ptr = basis * step / decay_steps + window_start`` while annealing, then
    pinned to ``basis + 1`` (``model/CPPN.py:144-159``).

    ``window_max > 0`` saturates the pointer at that band count forever — a
    capability the reference lacks: in extreme-sparse-view regimes the field
    memorizes the training views once too many frequency bands unlock
    (4-view forensics: train PSNR 36->57 dB while held-out collapses
    17->6.5 dB as the pointer passes ~4), so the cap holds the encoding at
    the band count the view geometry can actually constrain.
    """
    ptr = basis * step / decay_steps + window_start
    alpha = jnp.where(step < decay_steps, ptr, float(basis + 1))
    if 0 < window_max < basis:  # a cap at >= basis bands never binds
        alpha = jnp.minimum(alpha, float(window_max))
    return alpha


def free_window_mask(
    basis: int, step, decay_steps: int, window_start: int = 0,
    window_max: float = 0.0,
):
    """FreeNeRF per-band frequency mask, shape ``[basis]``.

    Bands below the pointer get (clipped) 1, the band at the pointer gets its
    fractional part, bands above get (clipped) 0; after ``decay_steps`` the
    mask is exactly ones. ``clip(ptr - band, 0, 1)`` reproduces the
    integer/fractional assignment of ``model/CPPN.py:148-155`` in closed
    form, including the ``[1e-8, 1-1e-8]`` stability clip.

    ``window_max > 0`` caps the pointer (see :func:`free_window_alpha`);
    bands at or above the cap stay at the clipped zero weight forever.
    """
    bands = jnp.arange(basis, dtype=jnp.float32)
    ptr = basis * step / decay_steps + window_start
    # Take the capped branch only when the cap BINDS (window_max < basis —
    # the mask is saturated for every band once ptr >= basis, so a larger
    # cap changes nothing). A non-binding cap must fall through to the
    # reference's exact pin-to-ones path after decay_steps, not park the
    # mask at the 1-1e-8 clip forever.
    if 0 < window_max < basis:
        ptr = jnp.minimum(ptr, float(window_max))
        return jnp.clip(jnp.clip(ptr - bands, 0.0, 1.0), 1e-8, 1.0 - 1e-8)
    mask = jnp.clip(jnp.clip(ptr - bands, 0.0, 1.0), 1e-8, 1.0 - 1e-8)
    return jnp.where(step < decay_steps, mask, jnp.ones((basis,), jnp.float32))


def nerfies_alpha(basis: int, step, decay_steps: int):
    """Nerfies window position: ``alpha = basis * step / decay_steps``
    (``model/CPPN.py:161-162``)."""
    return basis * step / decay_steps


def nerfies_window(basis: int, alpha):
    """Nerfies cosine ease window over bands, shape ``[basis]``.

    ``0.5 * (1 + cos(pi * clip(alpha - j, 0, 1) + pi))``
    (``model/CPPN.py:137-142``).
    """
    bands = jnp.arange(basis, dtype=jnp.float32)
    x = jnp.clip(alpha - bands, 0.0, 1.0)
    return 0.5 * (1 + jnp.cos(jnp.pi * x + jnp.pi))


def make_fourier_coefficients(key, basis: int, sigma: float, num_channels: int = 3):
    """Fixed Gaussian projection for 'fourier' mode, shape ``[num_channels*basis]``.

    Drawn once at model setup (``train/run_composite.py:139-145``) and scaled
    by ``fourier_sigma`` (``model/CPPN.py:35-38``).
    """
    import jax

    return jax.random.normal(key, (num_channels * basis,), dtype=jnp.float32) * sigma


def posenc(
    x,
    mode: str,
    basis: int,
    window=None,
    fourier_coefficients=None,
):
    """Encode coordinates ``x[..., C]`` -> features.

    ``window`` is the per-band weight vector ``[basis]`` (from
    :func:`free_window_mask` or :func:`nerfies_window`); pass ``None`` for an
    unwindowed encoding. Feature layout for the windowed/plain modes matches
    the reference reshape of ``[..., basis, 2, C]``: per band, C sin features
    then C cos features, with the raw coordinates prepended.
    """
    if mode == "none" or basis == 0:
        return x

    if mode == "fourier":
        if fourier_coefficients is None:
            raise ValueError("fourier mode requires fourier_coefficients")
        # fixed buffer, not a trainable parameter: the reference never
        # registers fourier_coefficients with the optimizer (CPPN.py:35-38)
        coef = jax.lax.stop_gradient(fourier_coefficients)
        tiled = jnp.concatenate([x] * basis, axis=-1)
        value = 2 * np.pi * tiled * coef
        return jnp.concatenate([jnp.sin(value), jnp.cos(value)], axis=-1)

    scales = 2.0 ** jnp.arange(basis, dtype=x.dtype)
    xb = x[..., None, :] * scales[:, None]  # [..., basis, C]
    # sin(t) and sin(t + pi/2) = cos(t), stacked as [..., basis, 2, C].
    four_feat = jnp.sin(jnp.stack([xb, xb + 0.5 * jnp.pi], axis=-2))
    if window is not None:
        four_feat = window[:, None, None].astype(x.dtype) * four_feat
    four_feat = four_feat.reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, four_feat], axis=-1)
