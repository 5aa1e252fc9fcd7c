"""Synthetic dynamic cardiac phantom.

The reference's 4-D volumes come from the proprietary XCAT binary
(``preprocess/xcat.py:90-94``) or a CCTA scan (``preprocess/preprocess_ccta.py``),
neither of which is redistributable. This module generates an analytically
defined stand-in with the same structure the method needs:

  - a STATIC background: a large soft-tissue ellipsoid plus a few dense
    rib/spine-like blobs (what the static field should absorb), and
  - a DYNAMIC coronary: a thin, bright, curved vessel tree whose position
    deforms with the cardiac phase (what the temporal field should capture).

Like the XCAT pipeline — which pins the artery attenuation to a fixed
``lca_val`` above softer background tissue (``preprocess/xcat.py:119-158``)
— the vessel is the brightest structure. Values here are attenuation per
WORLD UNIT (1 unit = 100 mm under the 1e-2 scale factor), chosen so
cone-beam line integrals land in the O(0.1-0.5) range that gives the
log-transmission images useful dynamic range.
"""

from __future__ import annotations

import numpy as np

NUM_PHASES = 10


def _vessel_centerline(ts: np.ndarray, phase: float) -> np.ndarray:
    """Parametric coronary-like curve in [-1, 1]^3, deformed by phase.

    The beat displaces the curve laterally and radially with a smooth
    periodic profile (max displacement mid-cycle).
    """
    beat = np.sin(np.pi * phase)  # 0 at phase 0, max at phase 0.5
    x = 0.55 * np.cos(2.2 * ts + 0.3) + 0.12 * beat * np.sin(3.0 * ts)
    y = 0.55 * np.sin(2.2 * ts) * 0.8 + 0.10 * beat
    z = 0.8 * ts - 0.1 * beat * np.cos(2.0 * ts)
    return np.stack([x, y, z], axis=-1)


def synthetic_phantom_volume(
    size: int = 64,
    phase: float = 0.0,
    lca_val: float = 1.2,
    background_val: float = 0.18,
    bone_val: float = 0.55,
    vessel_radius: float = 0.045,
    seed: int = 0,
    smooth_sigma: float = 1.0,
) -> np.ndarray:
    """One ``[size, size, size]`` float32 attenuation volume at cardiac
    ``phase`` in [0, 1).

    The background (ellipsoid + blobs) is phase-independent; only the vessel
    moves, so per-pixel temporal variance isolates the coronary exactly as
    the reference's variance-weight maps assume
    (``preprocess/general_helpers.py:17-44``).
    """
    lin = np.linspace(-1.0, 1.0, size, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")

    vol = np.zeros((size, size, size), dtype=np.float32)

    # soft-tissue ellipsoid
    body = (x / 0.85) ** 2 + (y / 0.75) ** 2 + (z / 0.9) ** 2
    vol += background_val * (body < 1.0)

    # static dense blobs (rib/spine analog), deterministic placement
    rng = np.random.default_rng(seed)
    for _ in range(4):
        c = rng.uniform(-0.5, 0.5, 3)
        r = rng.uniform(0.08, 0.16)
        d2 = (x - c[0]) ** 2 + (y - c[1]) ** 2 + (z - c[2]) ** 2
        vol += bone_val * (d2 < r * r)

    # dynamic vessel: distance to polyline centerline below radius
    ts = np.linspace(-1.0, 1.0, 96, dtype=np.float32)
    centers = _vessel_centerline(ts, phase)  # [96, 3]
    pts = np.stack([x, y, z], axis=-1)  # [S,S,S,3]
    # chunk over centerline to bound memory: track min distance
    min_d2 = np.full(vol.shape, np.inf, dtype=np.float32)
    for c in centers:
        d2 = ((pts - c) ** 2).sum(-1)
        np.minimum(min_d2, d2, out=min_d2)
    # taper the radius along the tree
    vessel = min_d2 < vessel_radius**2
    vol = np.where(vessel, np.float32(lca_val), vol)

    if smooth_sigma > 0:
        # soften the binary edges: real anatomy (XCAT/CCTA volumes) has
        # smooth attenuation transitions, and a coordinate MLP cannot
        # represent hard discontinuities — unsmoothed edges put an
        # irreducible floor under reconstruction error
        from scipy.ndimage import gaussian_filter

        vol = gaussian_filter(vol, sigma=smooth_sigma).astype(np.float32)

    return vol


def synthetic_phantom_series(
    size: int = 64, num_phases: int = NUM_PHASES, **kwargs
) -> list[np.ndarray]:
    """All cardiac phases, ``phase = i / num_phases`` (the reference's
    0..9 -> 0.0..0.9 convention, ``preprocess/datatoray.py:51-56``)."""
    return [
        synthetic_phantom_volume(size=size, phase=i / num_phases, **kwargs)
        for i in range(num_phases)
    ]
