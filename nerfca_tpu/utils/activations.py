"""Model-understanding API: capture intermediate activations.

The reference carries a dormant activation-capture stub on both models
(``store_activations`` / ``activation_dictionary``, ``model/CPPN.py:67-86``,
``model/Temporal.py:56-58,107-111``) that is never populated. Here it is
functional: run a field forward and get a named dictionary of every hidden
activation, without mutating any module state.
"""

from __future__ import annotations



import jax.numpy as jnp

from nerfca_tpu.models.fields import (
    FieldConfig,
    apply_static_field,
    apply_temporal_field,
)


def capture_static_activations(
    params,
    points,
    cfg: FieldConfig,
    window=None,
) -> dict[str, jnp.ndarray]:
    """Forward the static field and return ``{layer_name: activation}``
    plus the raw output under ``'output'``."""
    out, inter = apply_static_field(
        params, points, cfg, window=window, return_intermediates=True
    )
    return _name_activations(out, inter, cfg)


def capture_temporal_activations(
    params,
    points,
    phases,
    cfg: FieldConfig,
    window=None,
) -> dict[str, jnp.ndarray]:
    out, inter = apply_temporal_field(
        params, points, phases, cfg, window=window, return_intermediates=True
    )
    acts = _name_activations(out, inter, cfg)
    acts["latents"] = params["latents"][jnp.asarray(phases).astype(jnp.int32)]
    return acts


def _name_activations(out, intermediates, cfg: FieldConfig) -> dict:
    names = ["input_layer"] + [
        f"early_{i}" for i in range(cfg.num_early_layers)
    ]
    if cfg.num_late_layers > 0:
        names.append("skip")
        names += [f"late_{i}" for i in range(cfg.num_late_layers - 1)]
    acts = dict(zip(names, intermediates))
    acts["output"] = out
    return acts


def activation_statistics(acts: dict) -> dict:
    """Per-layer summary stats (mean/std/frac-dead) for quick inspection."""
    stats = {}
    for name, a in acts.items():
        stats[name] = {
            "mean": float(jnp.mean(a)),
            "std": float(jnp.std(a)),
            "frac_zero": float(jnp.mean(a == 0.0)),
            "shape": tuple(a.shape),
        }
    return stats
