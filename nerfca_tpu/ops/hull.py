"""Motion-hull prior: a 3-D occupancy grid space-carved from the training
views' temporal-variance maps, gating the dynamic field's density.

Why this exists (round-3 decomposition campaign, BENCH.md): at the 4-view
operating point the dynamic field reliably DETECTS the moving vessel on
views near the training hull (dyn_corr 0.6-0.7) but places it at the wrong
DEPTH, so views far outside the hull see it projected to the wrong 2-D
location (corr <= 0 on the lateral view). Every loss-side separation
mechanism studied (entropy ramps, occlusion variants, variance weighting)
either collapses the image or leaves placement unconstrained.

The hull fixes placement with observed data only: each training view
already ships a temporal-variance map (``preprocess/general_helpers.py:
17-44`` parity, ``data/dataset.py::write_variance_maps``) highlighting
pixels where the scene MOVES. A 3-D point can carry dynamic density only
if EVERY training view projects it into a moving pixel — the classic
space-carving argument, applied to motion instead of silhouettes. The
carved grid multiplies the temporal field's activated density:

    sigma_dyn(x) = act(raw_dyn(x)) * hull(x)

which is differentiable in the field parameters (the gate is data), zeroes
dynamic mass outside the visual hull of motion, and leaves the static
field untouched. This is a framework extension beyond the reference
(flag-gated, default off); the reference has no analog.

TPU notes: the gate is evaluated OUTSIDE the Pallas kernels (plain XLA
gathers) and rides into the fused train kernel as row 7 of the [8, N]
geometry stream — previously zero padding, so it adds no HBM traffic.
Sampling works on separate x/y/z coordinate arrays (never materializing
[N, 3], which TPU pads 16-42x — see BENCH.md round-1 layout findings).
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class MotionHull(NamedTuple):
    """The carved occupancy grid plus its world placement (a jax pytree).

    ``grid`` is (x, y, z)-indexed like the projector's volumes; voxel
    ``(i, j, k)`` sits at ``(idx - (res - 1)/2) * d_voxel + off_xyz``
    (the ``ops/projector.py`` world/volume mapping).
    """

    grid: jnp.ndarray  # [rx, ry, rz] float32 in [0, 1]
    d_voxel: jnp.ndarray  # [3] float32 grid spacing (x, y, z)
    off: jnp.ndarray  # [3] float32 world offset of the grid center (x, y, z)


def _project_to_pixels(pts: np.ndarray, theta: float, phi: float,
                       larm: float, info: dict) -> tuple[np.ndarray, np.ndarray]:
    """World points [N, 3] -> continuous detector pixel indices (a, b) for
    one C-arm view — the exact inverse of ``geometry.rays.detector_rays``:
    ``local = R^T (x - s)`` and ``u/DSD = local_x / local_z``, then the
    half-pixel-centered detector grid inverted for indices. ``larm`` is the
    frame's L-arm angle, threaded so the inverse always matches the ray
    pose (``carm_rotation`` currently ignores it for reference parity, but
    hardcoding 0 here would silently diverge if that ever changes)."""
    from nerfca_tpu.geometry.rotations import carm_source_matrix

    pose = carm_source_matrix(float(theta), float(phi), float(larm),
                              dso=float(info["DSO"]))
    rot = pose[:3, :3]
    src = pose[:3, 3]
    local = (pts - src[None, :]) @ rot  # == (R^T (x - s))^T rows
    z = np.maximum(local[:, 2], 1e-9)
    dsd = float(info["DSD"])
    u = dsd * local[:, 0] / z
    v = dsd * local[:, 1] / z
    d_det = np.asarray(info["dDetector"], np.float64)
    off_det = np.asarray(info["offDetector"], np.float64)
    w, h = (int(x) for x in info["nDetector"])
    a = (u - off_det[0]) / d_det[0] + w / 2 - 0.5
    b = (v - off_det[1]) / d_det[1] + h / 2 - 0.5
    return a, b


def _bilinear_01(img: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Bilinear sample of ``img[a, b]`` at continuous indices; out-of-image
    points sample 0 (no motion evidence outside the detector). ``img`` must
    be indexed [a, b] with ``a`` along detector u — ``build_motion_hull``
    asserts a square detector, where the loader's transpose makes the two
    axis orders coincide in shape."""
    na, nb = img.shape
    inb = (a >= 0) & (a <= na - 1) & (b >= 0) & (b <= nb - 1)
    ac = np.clip(a, 0, na - 1 - 1e-6)
    bc = np.clip(b, 0, nb - 1 - 1e-6)
    ia = np.floor(ac).astype(np.int64)
    ib = np.floor(bc).astype(np.int64)
    fa = ac - ia
    fb = bc - ib
    v00 = img[ia, ib]
    v10 = img[ia + 1, ib]
    v01 = img[ia, ib + 1]
    v11 = img[ia + 1, ib + 1]
    val = (v00 * (1 - fa) + v10 * fa) * (1 - fb) + (
        v01 * (1 - fa) + v11 * fa
    ) * fb
    return np.where(inb, val, 0.0)


def build_motion_hull(
    train_frames: list,
    info: dict,
    res: int = 96,
    thresh: float = 0.02,
    dilate: int = 3,
    sigma: float = 1.0,
) -> MotionHull | None:
    """Carve the motion hull from the training views' variance maps.

    ``train_frames``: loader frame dicts (one per train image; views
    deduplicated here). Returns None when no variance maps exist (partial
    cardiac cycles ship unit weights instead — there is nothing to carve).

    Pipeline per voxel center: min over training views of the bilinearly
    sampled NORMALIZED temporal variance (maps store weight = var + 1,
    ``data/dataset.py::write_variance_maps``), then threshold -> binary
    dilation (``dilate`` iterations, guards against clipping the true
    vessel at the hull boundary) -> Gaussian smoothing (``sigma`` voxels,
    keeps the gate differentiable-friendly rather than a hard step).
    """
    views: dict[tuple, str] = {}
    for row in train_frames:
        key = (float(row["theta"]), float(row["phi"]),
               float(row.get("larm", 0.0)))
        views.setdefault(key, row["weighted_file_path"])
    maps = []
    w, h = (int(x) for x in info["nDetector"])
    # the variance-map orientation transform below (reshape + transpose)
    # only keeps [a, b] = (detector u, v) indexing when the detector is
    # square; carving a rectangular detector would silently swap the axes
    assert w == h, (
        f"build_motion_hull requires a square detector, got nDetector="
        f"{info['nDetector']}"
    )
    for (theta, phi, larm), path in views.items():
        if not os.path.isfile(path):
            return None
        # the loader's exact orientation transform (loader.py:73-77):
        # [a, b] indexes detector u then v, matching detector_rays
        vmap = np.load(path).reshape(w, h).T.astype(np.float64) - 1.0
        maps.append((theta, phi, larm, vmap))
    if not maps:
        return None

    # general.json stores nVoxel/dVoxel in (x, y, z) order but offOrigin
    # reversed (z, y, x) — the projector's convention (ops/projector.py:
    # 16-20 reverses only offOrigin)
    n_vox = np.asarray(info["nVoxel"], np.float64)
    d_vol = np.asarray(info["dVoxel"], np.float64)
    off_xyz = np.asarray(info["offOrigin"], np.float64)[::-1]
    extent = n_vox * d_vol
    d_hull = extent / res

    idx = np.arange(res, dtype=np.float64) - (res - 1) / 2
    gx, gy, gz = np.meshgrid(idx * d_hull[0] + off_xyz[0],
                             idx * d_hull[1] + off_xyz[1],
                             idx * d_hull[2] + off_xyz[2], indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], axis=-1)

    hull = None
    for theta, phi, larm, vmap in maps:
        a, b = _project_to_pixels(pts, theta, phi, larm, info)
        val = _bilinear_01(vmap, a, b)
        hull = val if hull is None else np.minimum(hull, val)
    hull = hull.reshape(res, res, res)

    from scipy import ndimage

    mask = hull > thresh
    if dilate > 0 and mask.any():
        mask = ndimage.binary_dilation(mask, iterations=dilate)
    grid = mask.astype(np.float64)
    if sigma > 0:
        grid = ndimage.gaussian_filter(grid, sigma=sigma)
        top = grid.max()
        if top > 0:
            grid = np.clip(grid / top, 0.0, 1.0)
    return MotionHull(
        grid=jnp.asarray(grid, jnp.float32),
        d_voxel=jnp.asarray(d_hull, jnp.float32),
        off=jnp.asarray(off_xyz, jnp.float32),
    )


def hull_gate(hull: MotionHull, x, y, z):
    """Trilinear gate values at world coordinates given as SEPARATE
    same-shaped arrays (never builds [N, 3]; TPU pads minor-dim-3 arrays
    16-42x). Points outside the grid gate to 0."""
    rx, ry, rz = hull.grid.shape
    gx = (x - hull.off[0]) / hull.d_voxel[0] + (rx - 1) / 2
    gy = (y - hull.off[1]) / hull.d_voxel[1] + (ry - 1) / 2
    gz = (z - hull.off[2]) / hull.d_voxel[2] + (rz - 1) / 2
    inb = (
        (gx >= 0.0) & (gx <= rx - 1)
        & (gy >= 0.0) & (gy <= ry - 1)
        & (gz >= 0.0) & (gz <= rz - 1)
    )
    # Base-cell index clamped INTEGER-side to res-2 so the +1 corner is
    # always a valid gather. The former float-side clamp to `res-1-1e-6`
    # rounds to exactly `res-1` in f32 (eps at 95 is ~7.6e-6), so a sample
    # landing exactly on the far grid face indexed row `res` — and
    # jnp.take's default out-of-bounds mode FILLS NaN, which `* fx(=0)`
    # does not mask (NaN*0=NaN). One such sample per ~50M was enough to
    # kill the MAGIX-SURR run at step ~60 (cases/MAGIX-SURR autopsy,
    # scripts/magix_gate_probe3.py); mode="clip" is belt-and-braces.
    gx = jnp.clip(gx, 0.0, rx - 1)
    gy = jnp.clip(gy, 0.0, ry - 1)
    gz = jnp.clip(gz, 0.0, rz - 1)
    ix = jnp.minimum(jnp.floor(gx).astype(jnp.int32), rx - 2)
    iy = jnp.minimum(jnp.floor(gy).astype(jnp.int32), ry - 2)
    iz = jnp.minimum(jnp.floor(gz).astype(jnp.int32), rz - 2)
    fx = gx - ix
    fy = gy - iy
    fz = gz - iz
    flat = hull.grid.reshape(-1)

    def corner(dx, dy, dz):
        lin = ((ix + dx) * ry + (iy + dy)) * rz + (iz + dz)
        return jnp.take(flat, lin, mode="clip")

    c00 = corner(0, 0, 0) * (1 - fx) + corner(1, 0, 0) * fx
    c10 = corner(0, 1, 0) * (1 - fx) + corner(1, 1, 0) * fx
    c01 = corner(0, 0, 1) * (1 - fx) + corner(1, 0, 1) * fx
    c11 = corner(0, 1, 1) * (1 - fx) + corner(1, 1, 1) * fx
    val = (c00 * (1 - fy) + c10 * fy) * (1 - fz) + (
        c01 * (1 - fy) + c11 * fy
    ) * fz
    return jnp.where(inb, val, 0.0)


def hull_gate_rays(hull: MotionHull, origins, directions, z):
    """Gate values along rays: ``origins``/``directions`` [R, 3], ``z``
    either the shared [S] depth vector or per-ray [R, S]. Returns [R, S]
    without materializing [R, S, 3] points (coordinate-wise broadcasting)."""
    zz = z if z.ndim == 2 else z[None, :]
    x = origins[:, 0:1] + directions[:, 0:1] * zz
    y = origins[:, 1:2] + directions[:, 1:2] * zz
    w = origins[:, 2:3] + directions[:, 2:3] * zz
    return hull_gate(hull, x, y, w)


# The config-surface knobs that determine the carved hull (and therefore
# the model's effective dynamic density). Persisted into checkpoint
# run_metadata so offline eval gates EXACTLY as training did, instead of
# reconstructing the gate from whatever CLI flags eval happened to get.
HULL_ARG_DEFAULTS = {
    "use_motion_hull": False,
    "hull_res": 96,
    "hull_thresh": 0.02,
    "hull_dilate": 3,
    "hull_sigma": 1.0,
}


def hull_args_record(args) -> dict:
    """The checkpoint-persisted record of the hull gating configuration."""
    return {k: getattr(args, k, d) for k, d in HULL_ARG_DEFAULTS.items()}


def apply_hull_args_record(args, record: dict) -> None:
    """Default eval args from a checkpoint's persisted hull record.

    The stored record WINS (evaluating a hull-trained checkpoint without
    the gate silently scores a different model); a mismatch against the
    CLI-provided values is surfaced as a warning so a deliberate override
    is at least a visible decision."""
    import warnings

    for k, default in HULL_ARG_DEFAULTS.items():
        if k not in record:
            continue
        stored = type(default)(record[k])
        current = getattr(args, k, None)
        if current is not None and current != stored:
            warnings.warn(
                f"checkpoint was trained with {k}={stored} but eval args "
                f"say {k}={current}; using the checkpoint's value (the "
                f"gate is part of the model)",
                stacklevel=2,
            )
        setattr(args, k, stored)


def hull_from_args(args, train_frames, info):
    """The ONE place that maps the config surface (--use_motion_hull +
    hull_* knobs) to a built hull. Training, offline eval, and the render
    CLI must all gate the dynamic field with the SAME carved volume — each
    re-spelling the knob defaults is how train/eval divergence starts.
    Returns None when the flag is off or no variance maps exist."""
    if not getattr(args, "use_motion_hull", False):
        return None
    return build_motion_hull(
        train_frames,
        info,
        res=getattr(args, "hull_res", HULL_ARG_DEFAULTS["hull_res"]),
        thresh=getattr(args, "hull_thresh", HULL_ARG_DEFAULTS["hull_thresh"]),
        dilate=getattr(args, "hull_dilate", HULL_ARG_DEFAULTS["hull_dilate"]),
        sigma=getattr(args, "hull_sigma", HULL_ARG_DEFAULTS["hull_sigma"]),
    )
