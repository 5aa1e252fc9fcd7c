"""JAX cone-beam forward projector — the TPU-native replacement for TIGRE's
CUDA ``Ax``.

The reference generates training projections with the external TIGRE
CUDA library (``preprocess/tigre_helpers.py:58-63``); its own CPU fallback
(``preprocess/proj_helpers.py:84-115``, 'ct' mode) defines the math this
module reproduces: trilinear sampling of the attenuation volume along each
detector ray and a rectangle-rule sum over depth, with zero fill outside the
volume.

Self-consistency note: projections are generated along the SAME rays the
trainer uses (``nerfca_tpu.geometry.detector_rays``), so no detector flip is
needed — the reference's ``np.flipud`` (``tigre_helpers.py:117``) exists
only to reconcile TIGRE's internal detector row order with those rays.

World/volume mapping: voxel ``(ix, iy, iz)`` of a volume indexed in
(x, y, z) order sits at ``(idx - (n-1)/2) * dVoxel + offOrigin_xyz``, where
``offOrigin_xyz`` reverses the stored (z, y, x) offset — exactly the grid
the reference's visual ground-truth interpolator builds
(``preprocess/datatoray.py:65-92`` translates by ``geo.offOrigin[::-1]``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nerfca_tpu.geometry.rays import detector_rays


def trilinear_sample(volume, pts):
    """Trilinearly interpolate ``volume[nx, ny, nz]`` at continuous voxel
    coordinates ``pts[..., 3]``; points outside the grid contribute 0.

    Matches ``scipy.interpolate.RegularGridInterpolator(method='linear',
    fill_value=0)`` on a unit-spaced grid (``preprocess/datatoray.py:90-92``).
    """
    nx, ny, nz = volume.shape
    # out-of-bounds mask before clipping (linear interp valid inside [0, n-1])
    in_bounds = jnp.all(
        (pts >= 0.0) & (pts <= jnp.array([nx - 1, ny - 1, nz - 1], pts.dtype)),
        axis=-1,
    )
    p = jnp.clip(
        pts, 0.0, jnp.array([nx - 1, ny - 1, nz - 1], pts.dtype) - 1e-6
    )
    i0 = jnp.floor(p).astype(jnp.int32)
    frac = p - i0

    def gather(dx, dy, dz):
        idx = i0 + jnp.array([dx, dy, dz], jnp.int32)
        return volume[idx[..., 0], idx[..., 1], idx[..., 2]]

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c00 = gather(0, 0, 0) * (1 - fx) + gather(1, 0, 0) * fx
    c10 = gather(0, 1, 0) * (1 - fx) + gather(1, 1, 0) * fx
    c01 = gather(0, 0, 1) * (1 - fx) + gather(1, 0, 1) * fx
    c11 = gather(0, 1, 1) * (1 - fx) + gather(1, 1, 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return jnp.where(in_bounds, c0 * (1 - fz) + c1 * fz, 0.0)


def world_to_voxel(points, vol_shape, d_voxel, off_origin_zyx):
    """World coordinates -> continuous voxel indices for an (x, y, z)-indexed
    volume centered at the reversed ``offOrigin``."""
    n = jnp.array(vol_shape, points.dtype)
    d = jnp.asarray(d_voxel, points.dtype)
    off = jnp.asarray(off_origin_zyx, points.dtype)[::-1]
    return (points - off) / d + (n - 1) / 2


@functools.partial(
    jax.jit, static_argnames=("n_samples", "tile", "mode")
)
def _project_rays(
    volume,
    origins,
    directions,
    depth_values,
    d_voxel,
    off_origin,
    *,
    n_samples: int,
    tile: int,
    mode: str,
):
    """Integrate the volume along flattened rays, tiled to bound memory.

    ``mode='ct'``: rectangle-rule attenuation line integral (dists with the
    1e-10 terminal delta, matching ``proj_helpers.py:96-109``).
    ``mode='mip'``: max intensity along the ray (``proj_helpers.py:110-111``).
    """
    dists = jnp.concatenate(
        [depth_values[1:] - depth_values[:-1], jnp.full((1,), 1e-10, volume.dtype)]
    )

    def one_tile(args):
        o, d = args  # [tile, 3]
        pts = o[:, None, :] + d[:, None, :] * depth_values[:, None]  # [tile, S, 3]
        vox = world_to_voxel(pts, volume.shape, d_voxel, off_origin)
        vals = trilinear_sample(volume, vox)  # [tile, S]
        if mode == "mip":
            return jnp.max(vals, axis=-1)
        return jnp.sum(vals * dists, axis=-1)

    n_rays = origins.shape[0]
    n_tiles = n_rays // tile
    o_t = origins.reshape(n_tiles, tile, 3)
    d_t = directions.reshape(n_tiles, tile, 3)
    out = jax.lax.map(one_tile, (o_t, d_t))
    return out.reshape(n_rays)


def project_view(
    volume,
    geo_info: dict,
    theta_deg: float,
    phi_deg: float,
    larm_deg: float = 0.0,
    n_samples: int = 1000,
    mode: str = "ct",
    tile: int = 2048,
):
    """Project one view: returns the ``[W, H]`` absorption line-integral image
    (or MIP image), aligned pixel-for-pixel with ``detector_rays``.

    ``geo_info`` must carry near/far (the ``general.json`` contract) or they
    are derived from DSO/sVoxel bounds by the caller.
    """
    origins, dirs = detector_rays(theta_deg, phi_deg, larm_deg, geo_info)
    w, h = origins.shape[:2]
    depth_values = jnp.linspace(
        float(geo_info["near_thresh"]), float(geo_info["far_thresh"]), n_samples
    ).astype(volume.dtype)

    flat_o = origins.reshape(-1, 3)
    flat_d = dirs.reshape(-1, 3)
    n_rays = flat_o.shape[0]
    tile = min(tile, n_rays)
    # pad to a tile multiple (static shapes for jit)
    pad = (-n_rays) % tile
    if pad:
        flat_o = jnp.concatenate([flat_o, jnp.zeros((pad, 3), flat_o.dtype)])
        flat_d = jnp.concatenate([flat_d, jnp.zeros((pad, 3), flat_d.dtype)])

    img = _project_rays(
        jnp.asarray(volume),
        flat_o,
        flat_d,
        depth_values,
        tuple(float(v) for v in geo_info["dVoxel"]),
        tuple(float(v) for v in geo_info["offOrigin"]),
        n_samples=n_samples,
        tile=tile,
        mode=mode,
    )
    return img[:n_rays].reshape(w, h)


def transmission_image(line_integral, max_pixel_value: float):
    """Absorption line integral -> normalized log-transmission image.

    ``I = max_pix * exp(-integral)``; stored image is the min-max normalized
    ``log(I)`` plus its (min, max) for denormalization
    (``preprocess/tigre_helpers.py:118-127``).
    """
    log_img = np.log(max_pixel_value) - np.asarray(line_integral)
    img_min, img_max = float(log_img.min()), float(log_img.max())
    denom = img_max - img_min
    if denom == 0.0:
        return np.zeros_like(log_img), img_min, img_max
    return (log_img - img_min) / denom, img_min, img_max
