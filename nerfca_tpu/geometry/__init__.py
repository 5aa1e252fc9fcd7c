"""C-arm cone-beam geometry: rotations, poses, detector rays.

Reference parity: ``train/proj_helpers.py`` and
``preprocess/tigre_helpers.py`` / ``preprocess/proj_helpers.py`` in
kirstenmaas/NeRF-CA.
"""

from nerfca_tpu.geometry.rotations import (
    rot_x,
    rot_y,
    rot_z,
    translation,
    carm_rotation,
    carm_source_matrix,
    roadmap_rotation,
    roadmap_source_matrix,
)
from nerfca_tpu.geometry.cone import (
    ConeGeometry,
    get_near_far,
    xcat_geometry,
    ccta_geometry,
    synth_geometry,
    MAX_PIXEL_VALUE,
    SCALE_FACTOR,
)
from nerfca_tpu.geometry.rays import detector_rays, detector_grid, perspective_rays

__all__ = [
    "rot_x",
    "rot_y",
    "rot_z",
    "translation",
    "carm_rotation",
    "carm_source_matrix",
    "roadmap_rotation",
    "roadmap_source_matrix",
    "ConeGeometry",
    "get_near_far",
    "xcat_geometry",
    "ccta_geometry",
    "synth_geometry",
    "MAX_PIXEL_VALUE",
    "SCALE_FACTOR",
    "detector_rays",
    "detector_grid",
    "perspective_rays",
]
