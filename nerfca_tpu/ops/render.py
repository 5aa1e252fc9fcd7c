"""X-ray transmission rendering (Beer-Lambert in log-intensity space).

This is NOT classic NeRF alpha compositing: the pixel prediction is
``I0 - sum_i sigma_i * dist_i`` with ``I0 = log(max_pixel_value)`` — a pure
attenuation line integral in log space, which on TPU fuses into the field
MLP evaluation as a single reduction.

Reference parity: ``train/model_helpers.py:63-97``. Two documented quirks
are preserved exactly:
  - the single-field renderer returns the UNSCALED sigma (scale folded into
    the weights), while the composite renderer returns sigmas already
    multiplied by ``scale_value`` (``model_helpers.py:77-81`` vs ``:91-93``);
    downstream regularizers consume whichever their driver produces.
  - the final sample's dist is 1e-10 (``model_helpers.py:73``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_deltas(depth_values):
    """Adjacent depth differences with a 1e-10 terminal delta, shape-preserving.

    ``depth_values`` may be 1-D (the shared per-batch vector, the common
    case) or ``[..., S]``.
    """
    tail = jnp.full_like(depth_values[..., :1], 1e-10)
    return jnp.concatenate(
        [depth_values[..., 1:] - depth_values[..., :-1], tail], axis=-1
    )


def output_activation(raw, kind: str = "softplus"):
    """Map raw MLP output to nonnegative density.

    ``'sigmoid'`` (reference default), ``'softplus'`` (shipped configs), or
    ``'clamp'`` = hardtanh(softplus, 0, 1) (``model_helpers.py:63-70``).
    ``kind`` is matched case-insensitively (the config surface ships
    ``'Softplus'`` as a default spelling, ``train/data_helpers.py:60``).
    """
    kind = kind.lower()
    if kind == "softplus":
        return jax.nn.softplus(raw)
    if kind == "sigmoid":
        return jax.nn.sigmoid(raw)
    if kind == "clamp":
        return jnp.clip(jax.nn.softplus(raw), 0.0, 1.0)
    raise ValueError(f"unknown output activation {kind!r}")


def render_transmission(
    raw_field,
    initial_intensities,
    depth_values,
    activation: str = "softplus",
    scale_value: float = 1e-2,
    gate=None,
):
    """Single-field renderer (``model_helpers.py:86-97``).

    ``raw_field``: ``[R, S, C]`` raw MLP outputs (density in the last
    channel). ``initial_intensities``: ``[R]`` log-space source intensity.
    ``gate``: optional ``[R, S]`` multiplier on the activated density (the
    motion-hull prior, ``ops/hull.py``; framework extension, default off).
    Returns ``(int_map [R], sigma [R, S] UNSCALED, dists)``.
    """
    dists = depth_deltas(depth_values)
    sigma = output_activation(raw_field[..., -1], activation)
    if gate is not None:
        sigma = sigma * gate
    int_map = initial_intensities - jnp.sum(sigma * dists * scale_value, axis=-1)
    return int_map, sigma, dists


def render_transmission_composite(
    static_raw,
    temp_raw,
    initial_intensities,
    depth_values,
    activation: str = "softplus",
    scale_value: float = 1e-2,
    temp_gate=None,
):
    """Two-field renderer (``model_helpers.py:72-84``).

    ``temp_gate``: optional ``[R, S]`` multiplier on the activated dynamic
    density (the motion-hull prior, ``ops/hull.py``); the regularizers then
    see the GATED dynamic sigma, which is the point — dynamic mass outside
    the hull contributes nothing anywhere.
    Returns ``(int_map [R], static_sigma [R, S], temp_sigma [R, S], dists)``
    with both sigmas PRE-SCALED by ``scale_value``, as the regularizers
    expect.
    """
    dists = depth_deltas(depth_values)
    static_sigma = output_activation(static_raw[..., -1], activation) * scale_value
    temp_sigma = output_activation(temp_raw[..., -1], activation) * scale_value
    if temp_gate is not None:
        temp_sigma = temp_sigma * temp_gate
    weights = (static_sigma + temp_sigma) * dists
    int_map = initial_intensities - jnp.sum(weights, axis=-1)
    return int_map, static_sigma, temp_sigma, dists
