"""Numerical core: encodings, depth sampling, X-ray rendering, losses.

Reference parity: ``train/model_helpers.py`` and the encoder code duplicated
across ``model/CPPN.py`` / ``model/Temporal.py`` in kirstenmaas/NeRF-CA.
"""

from nerfca_tpu.ops.encoding import (
    posenc,
    encoded_feature_count,
    free_window_mask,
    free_window_alpha,
    nerfies_window,
    nerfies_alpha,
)
from nerfca_tpu.ops.sampling import (
    linspace_depths,
    stratify_depths,
    sample_pdf,
)
from nerfca_tpu.ops.render import (
    depth_deltas,
    output_activation,
    render_transmission,
    render_transmission_composite,
)
from nerfca_tpu.ops.losses import (
    blend_ratio,
    blendw_entropy_loss,
    ray_entropy_loss,
    occlusion_loss,
    weighted_mse,
    composite_losses,
)
from nerfca_tpu.ops.schedules import linear_param_decay, exp_param_decay

__all__ = [
    "posenc",
    "encoded_feature_count",
    "free_window_mask",
    "free_window_alpha",
    "nerfies_window",
    "nerfies_alpha",
    "linspace_depths",
    "stratify_depths",
    "sample_pdf",
    "depth_deltas",
    "output_activation",
    "render_transmission",
    "render_transmission_composite",
    "blend_ratio",
    "blendw_entropy_loss",
    "ray_entropy_loss",
    "occlusion_loss",
    "weighted_mse",
    "composite_losses",
    "linear_param_decay",
    "exp_param_decay",
]
