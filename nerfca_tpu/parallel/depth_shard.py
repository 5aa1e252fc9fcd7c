"""Depth-sample (ray-segment) parallel rendering via ``shard_map``.

The sequence-parallel analog for this workload (SURVEY §2.5): the S depth
samples per ray are split across the ``'depth'`` mesh axis. Each device
evaluates the field MLPs on its local sample slab and computes a PARTIAL
Beer-Lambert attenuation sum; one ``psum`` over ICI produces the pixel
value. This works because the X-ray renderer is a pure sum over samples
(``train/model_helpers.py:82,95``) — no transmittance-ordering dependency
like classic NeRF compositing.

Use case: full-image eval renders and serving, where S x W x H points
exceed one chip's appetite; training keeps plain data parallelism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from nerfca_tpu.models.fields import (
    FieldConfig,
    apply_static_field,
    apply_temporal_field,
)
from nerfca_tpu.ops.render import depth_deltas, output_activation


def depth_sharded_render(
    mesh: Mesh,
    params,
    origins,
    directions,
    phases,
    depth_values,
    static_cfg: FieldConfig,
    temp_cfg: FieldConfig,
    windows,
    initial_intensity: float,
    activation: str = "softplus",
    scale_value: float = 1e-2,
    axis: str = "depth",
):
    """Composite render with the sample axis sharded over ``axis``.

    ``origins``/``directions``: ``[R, 3]`` (replicated), ``phases``: ``[R]``,
    ``depth_values``: ``[S]`` with S divisible by the axis size. Returns
    ``(pix [R], static_attn [R], temp_attn [R])`` where the attns are the
    per-ray attenuation sums of each field alone (for decomposed renders).
    """
    # dists depend on neighboring samples; precompute globally (cheap, [S])
    # so each shard carries its correct local deltas.
    dists = depth_deltas(depth_values)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
    )
    def render(params_, o, d, ph, z_local, dists_local):
        pts = o[:, None, :] + d[:, None, :] * z_local[:, None]  # [R, S_loc, 3]
        pph = jnp.broadcast_to(ph[:, None], pts.shape[:2]).astype(jnp.int32)
        s_raw = apply_static_field(
            params_["static"], pts, static_cfg, window=windows["static"]
        )
        t_raw = apply_temporal_field(
            params_["temp"], pts, pph, temp_cfg, window=windows["temp"]
        )
        s_sig = output_activation(s_raw[..., -1], activation) * scale_value
        t_sig = output_activation(t_raw[..., -1], activation) * scale_value
        s_part = jnp.sum(s_sig * dists_local, axis=-1)
        t_part = jnp.sum(t_sig * dists_local, axis=-1)
        s_attn = jax.lax.psum(s_part, axis)
        t_attn = jax.lax.psum(t_part, axis)
        return initial_intensity - (s_attn + t_attn), s_attn, t_attn

    return render(params, origins, directions, phases, depth_values, dists)
