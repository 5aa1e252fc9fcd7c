"""Loss-weight annealing schedules, traceable as functions of the step.

Reference parity: ``train/model_helpers.py:264-282``. The reference computes
these on the host each iteration; here they are jnp functions of the traced
step counter so the whole annealing schedule lives inside the jitted step.
"""

from __future__ import annotations

import jax.numpy as jnp


def linear_param_decay(step, start_weight, end_weight, steps, delay_steps=0):
    """Linear ramp from ``start_weight`` to ``end_weight`` over ``steps``
    iterations, returning 0 before ``delay_steps`` (``model_helpers.py:264-270``)."""
    alpha = jnp.minimum((step - delay_steps) / steps, 1.0)
    value = (1.0 - alpha) * start_weight + alpha * end_weight
    return jnp.where(step < delay_steps, 0.0, value)


def exp_param_decay(step, start_weight, end_weight, steps, delay_steps=0):
    """Exponential interpolation (``model_helpers.py:272-282``).

    Quirk preserved: the exponent uses ``step / (steps - 1)`` without
    subtracting the delay.
    """
    if start_weight == end_weight:
        return jnp.where(step < delay_steps, 0.0, jnp.asarray(start_weight, jnp.float32))
    base = end_weight / start_weight
    value = start_weight * base ** (step / (steps - 1))
    value = jnp.where(step >= steps, end_weight, value)
    return jnp.where(step < delay_steps, 0.0, value)
