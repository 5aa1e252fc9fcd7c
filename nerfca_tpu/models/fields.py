"""Static (CPPN) and temporal coordinate-MLP fields as pure functions.

Architecture (reference: ``model/CPPN.py:6-110``, ``model/Temporal.py:6-151``):

    encode(x) -> [input layer -> ReLU] -> num_early x [hidden -> ReLU]
              -> optional skip: concat(encoded, h) -> [skip layer -> ReLU]
                 -> (num_late - 1) x [hidden -> ReLU]
              -> linear output (1 channel of raw density)

The temporal field additionally gathers a learnable per-phase latent row
(10 cardiac phases x ``num_time_dim``; ``model/Temporal.py:23-26``) and
concatenates it to the encoded position before the MLP
(``model/Temporal.py:113-151``).

Design departures from the reference (all TPU-motivated):
  - Parameters are pytrees; application is a pure function — no module
    state. The encoding window is an explicit argument computed from the
    step counter (see ``nerfca_tpu.ops.encoding``).
  - Matmuls may run in bfloat16 with float32 accumulation
    (``compute_dtype``); parameters and reductions stay float32, which keeps
    the 1e-15-scale regularizer arithmetic exact.
  - The temporal skip path concatenates [encoded_pts, latent, h] and is
    fully functional — the reference's ``query_time`` crashes for
    ``num_late_layers > 0`` (``model/Temporal.py:128-136`` never assigns
    ``outputs``); here it is simply supported.

The reference's dormant "model understanding API"
(``CPPN.py:67-69,82-86``) maps to ``return_intermediates=True``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from nerfca_tpu.ops.encoding import encoded_feature_count, posenc

Params = Dict[str, Any]

NUM_CARDIAC_PHASES = 10  # fixed frame table, ``model/Temporal.py:23-26``


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static hyperparameters of one field MLP (hashable, safe as a jit
    static argument)."""

    num_early_layers: int = 4
    num_late_layers: int = 0
    num_filters: int = 128
    num_input_channels: int = 3
    num_output_channels: int = 1
    use_bias: bool = True
    pos_enc: str = "free_windowed"
    pos_enc_basis: int = 12
    pos_enc_window_start: int = 0
    pos_enc_window_decay_steps: int = 150000
    # saturate the annealing pointer at this band count (0 = no cap); the
    # sparse-view anti-memorization control, see ops/encoding.py
    pos_enc_window_max: float = 0.0
    fourier_sigma: float = 0.0
    # temporal-only
    use_time_latents: bool = False
    num_time_dim: int = 8

    @property
    def encoded_features(self) -> int:
        return encoded_feature_count(
            self.pos_enc, self.pos_enc_basis, self.num_input_channels
        )

    @property
    def input_features(self) -> int:
        """MLP input width: encoded position (+ time latent for temporal)."""
        if self.use_time_latents:
            return self.encoded_features + self.num_time_dim
        return self.encoded_features


def _init_linear(key, fan_in: int, fan_out: int, use_bias: bool) -> Params:
    """Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)) for weights and bias —
    the PyTorch ``nn.Linear`` default the reference trains with."""
    bound = 1.0 / jnp.sqrt(fan_in)
    wkey, bkey = jax.random.split(key)
    layer = {
        "w": jax.random.uniform(
            wkey, (fan_in, fan_out), jnp.float32, minval=-bound, maxval=bound
        )
    }
    if use_bias:
        layer["b"] = jax.random.uniform(
            bkey, (fan_out,), jnp.float32, minval=-bound, maxval=bound
        )
    return layer


def _init_mlp(key, cfg: FieldConfig) -> Params:
    keys = iter(jax.random.split(key, cfg.num_early_layers + cfg.num_late_layers + 3))
    f_in, width = cfg.input_features, cfg.num_filters

    early = [_init_linear(next(keys), f_in, width, cfg.use_bias)]
    for _ in range(cfg.num_early_layers):
        early.append(_init_linear(next(keys), width, width, cfg.use_bias))

    params: Params = {"early": early}
    if cfg.num_late_layers > 0:
        params["skip"] = _init_linear(next(keys), width + f_in, width, cfg.use_bias)
        params["late"] = [
            _init_linear(next(keys), width, width, cfg.use_bias)
            for _ in range(cfg.num_late_layers - 1)
        ]
    params["out"] = _init_linear(next(keys), width, cfg.num_output_channels, cfg.use_bias)
    return params


def init_static_field(key, cfg: FieldConfig, fourier_gaussian=None) -> Params:
    """Initialize a static field. For ``pos_enc='fourier'``, pass the fixed
    Gaussian draw (``train/run_composite.py:139-145``) or it is drawn here."""
    params = _init_mlp(key, cfg)
    if cfg.pos_enc == "fourier":
        if fourier_gaussian is None:
            fourier_gaussian = jax.random.normal(
                jax.random.fold_in(key, 0xF0),
                (cfg.num_input_channels * cfg.pos_enc_basis,),
            )
        params["fourier"] = jnp.asarray(fourier_gaussian) * cfg.fourier_sigma
    return params


def init_temporal_field(key, cfg: FieldConfig, fourier_gaussian=None) -> Params:
    """Initialize a temporal field including the Uniform[0,1) latent table
    (``model/Temporal.py:23-26``)."""
    if not cfg.use_time_latents:
        raise ValueError("temporal field requires use_time_latents=True")
    params = init_static_field(key, cfg, fourier_gaussian)
    params["latents"] = jax.random.uniform(
        jax.random.fold_in(key, 0x71), (NUM_CARDIAC_PHASES, cfg.num_time_dim)
    )
    return params


def _linear(layer: Params, x, compute_dtype):
    w = layer["w"].astype(compute_dtype)
    y = jnp.dot(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    if "b" in layer:
        y = y + layer["b"]
    return y


def apply_mlp(
    params: Params,
    features,
    cfg: FieldConfig,
    compute_dtype=jnp.float32,
    return_intermediates: bool = False,
):
    """Run the MLP trunk on already-encoded features ``[..., F]``."""
    intermediates = []
    h = features
    for layer in params["early"]:
        h = jax.nn.relu(_linear(layer, h, compute_dtype))
        if return_intermediates:
            intermediates.append(h)
    if cfg.num_late_layers > 0:
        h = jax.nn.relu(
            _linear(params["skip"], jnp.concatenate([features, h], axis=-1), compute_dtype)
        )
        if return_intermediates:
            intermediates.append(h)
        for layer in params["late"]:
            h = jax.nn.relu(_linear(layer, h, compute_dtype))
            if return_intermediates:
                intermediates.append(h)
    out = _linear(params["out"], h, compute_dtype)
    if return_intermediates:
        return out, intermediates
    return out


def apply_static_field(
    params: Params,
    points,
    cfg: FieldConfig,
    window=None,
    compute_dtype=jnp.float32,
    return_intermediates: bool = False,
):
    """Static field: ``points [..., 3] -> raw density [..., C_out]``.

    ``window`` is the per-band annealing vector for windowed encodings
    (``None`` = unwindowed / not applicable).
    """
    enc = posenc(
        points,
        cfg.pos_enc,
        cfg.pos_enc_basis,
        window=window,
        fourier_coefficients=params.get("fourier"),
    )
    return apply_mlp(params, enc, cfg, compute_dtype, return_intermediates)


def apply_temporal_field(
    params: Params,
    points,
    phases,
    cfg: FieldConfig,
    window=None,
    compute_dtype=jnp.float32,
    return_intermediates: bool = False,
):
    """Temporal field: ``points [..., 3]``, integer ``phases [...]`` ->
    raw density.

    The phase indexes the latent table (``model/Temporal.py:138-151``); the
    latent row is concatenated to the encoded position
    (``model/Temporal.py:113-126``).
    """
    enc = posenc(
        points,
        cfg.pos_enc,
        cfg.pos_enc_basis,
        window=window,
        fourier_coefficients=params.get("fourier"),
    )
    latents = params["latents"][phases.astype(jnp.int32)]
    features = jnp.concatenate([enc, latents], axis=-1)
    return apply_mlp(params, features, cfg, compute_dtype, return_intermediates)
