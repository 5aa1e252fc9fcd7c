"""Detector-plane ray generation, batched in JAX.

Given a C-arm pose and cone-beam geometry, produce per-pixel ray origins and
(unnormalized) directions. The pose construction is host numpy (one 4x4 per
view); the pixel grid -> world-ray mapping is pure jnp so it can run on
device and fuse into downstream kernels.

Reference parity: ``train/proj_helpers.py:65-90`` (and the equivalent
``preprocess/tigre_helpers.py:82-104``):
  - half-pixel-centered detector coordinates with ``offDetector`` shift,
  - direction [u/DSD, v/DSD, 1] rotated by the pose; origin = pose
    translation; directions deliberately NOT normalized (depth values are
    measured along this direction scale).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nerfca_tpu.geometry.rotations import carm_source_matrix


def detector_grid(
    img_width: int,
    img_height: int,
    d_detector,
    off_detector,
    dsd: float,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Unrotated unit-depth ray directions for every detector pixel.

    Returns ``[W, H, 3]`` where entry ``[a, b]`` corresponds to detector
    coordinate ``u = (a + 0.5 - W/2) * du + off_u``,
    ``v = (b + 0.5 - H/2) * dv + off_v`` — i.e. rows index the first detector
    axis, matching the reference's transposed meshgrid
    (``train/proj_helpers.py:72-81``).
    """
    a = jnp.arange(img_width, dtype=dtype)[:, None]
    b = jnp.arange(img_height, dtype=dtype)[None, :]
    uu = (a + 0.5 - img_width / 2) * float(d_detector[0]) + float(off_detector[0])
    vv = (b + 0.5 - img_height / 2) * float(d_detector[1]) + float(off_detector[1])
    uu, vv = jnp.broadcast_arrays(uu, vv)
    return jnp.stack([uu / dsd, vv / dsd, jnp.ones_like(uu)], axis=-1)


def detector_rays(
    theta_deg: float,
    phi_deg: float,
    larm_deg: float,
    geo_info: dict,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel (origins, directions), each ``[W, H, 3]``, for one view.

    ``geo_info`` is the flat geometry dict (the ``general.json`` contract):
    keys DSO, DSD, nDetector, dDetector, offDetector.
    """
    pose = carm_source_matrix(theta_deg, phi_deg, larm_deg, dso=float(geo_info["DSO"]))
    img_width, img_height = (int(x) for x in geo_info["nDetector"])
    dirs = detector_grid(
        img_width,
        img_height,
        geo_info["dDetector"],
        geo_info["offDetector"],
        float(geo_info["DSD"]),
        dtype=dtype,
    )
    rot = jnp.asarray(pose[:3, :3], dtype=dtype)
    ray_directions = dirs @ rot.T
    ray_origins = jnp.broadcast_to(
        jnp.asarray(pose[:3, 3], dtype=dtype), ray_directions.shape
    )
    return ray_origins, ray_directions


def pose_matrix(theta_deg: float, phi_deg: float, larm_deg: float, dso: float) -> np.ndarray:
    """Host-side 4x4 world-from-source pose (for ``srcmatrices.json`` parity)."""
    return carm_source_matrix(theta_deg, phi_deg, larm_deg, dso=dso)


def perspective_rays(
    theta_deg: float,
    phi_deg: float,
    larm_deg: float,
    source_pt,
    img_width: int,
    img_height: int,
    focal_length: float,
    table_translation=(0.0, 0.0, 0.0),
    dtype=jnp.float32,
):
    """Classic pinhole-style ray generation under the 'roadmap' pose.

    Reference parity: ``preprocess/proj_helpers.py:48-67``
    (``get_ray_values``) — pixel-corner (not half-pixel-centered) grid,
    directions ``[(i - W/2)/f, -(j - H/2)/f, -1]`` rotated by the roadmap
    pose with source and table translations. Used by the reference's
    non-TIGRE 'roadmap' x_ray_type; kept for full capability parity.
    """
    from nerfca_tpu.geometry.rotations import roadmap_source_matrix

    pose = roadmap_source_matrix(
        source_pt, theta_deg, phi_deg, larm_deg, table_translation
    )
    i = jnp.arange(img_width, dtype=dtype)[None, :]
    j = jnp.arange(img_height, dtype=dtype)[:, None]
    dirs = jnp.stack(
        jnp.broadcast_arrays(
            (i - img_width / 2) / focal_length,
            -(j - img_height / 2) / focal_length,
            -jnp.ones((img_height, img_width), dtype),
        ),
        axis=-1,
    )
    rot = jnp.asarray(pose[:3, :3], dtype=dtype)
    ray_directions = dirs @ rot.T
    ray_origins = jnp.broadcast_to(
        jnp.asarray(pose[:3, 3], dtype=dtype), ray_directions.shape
    )
    return ray_origins, ray_directions
