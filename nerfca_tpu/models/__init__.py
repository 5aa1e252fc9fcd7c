"""Neural fields: static background (CPPN) and temporal coronary MLPs.

Reference parity: ``model/CPPN.py`` and ``model/Temporal.py`` in
kirstenmaas/NeRF-CA, redesigned as pure functions over parameter pytrees.
"""

from nerfca_tpu.models.fields import (
    FieldConfig,
    init_static_field,
    init_temporal_field,
    apply_static_field,
    apply_temporal_field,
    apply_mlp,
)

__all__ = [
    "FieldConfig",
    "init_static_field",
    "init_temporal_field",
    "apply_static_field",
    "apply_temporal_field",
    "apply_mlp",
]
