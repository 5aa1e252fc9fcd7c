"""Cone-beam acquisition geometry and the shipped XCAT/CCTA presets.

The geometry is an immutable dataclass (a pytree-free host object); all
device code receives plain arrays/scalars derived from it so that nothing
non-hashable leaks into jit traces.

Reference parity:
  - ``ConeGeometry``: ``preprocess/tigre_helpers.py:11-42`` — mm -> scaled
    units via ``scale_factor=1e-2``; ``nVoxel`` stored reversed (the TIGRE
    (z, y, x) convention).
  - near/far bound: ``preprocess/tigre_helpers.py:44-56``.
  - presets: ``preprocess/tigre_helpers.py:140-206``.
  - ``MAX_PIXEL_VALUE`` / ``SCALE_FACTOR``: ``preprocess/datatoray.py:19-20``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

# Calibrated source intensity of the phantom CT generator; images live in
# log space as log(MAX_PIXEL_VALUE) - line_integral.
MAX_PIXEL_VALUE = 8.670397
# mm -> internal units.
SCALE_FACTOR = 1e-2


@dataclasses.dataclass(frozen=True)
class ConeGeometry:
    """Cone-beam CT geometry, all lengths in scaled units (mm * scale_factor).

    ``nVoxel``/``sVoxel`` follow the reference's reversed (z, y, x) storage
    order; ``dVoxel`` and ``offOrigin`` stay in the (x, y, z) order they were
    specified in, mirroring the reference exactly.
    """

    DSD: float  # distance source -> detector
    DSO: float  # distance source -> origin (isocenter)
    nDetector: np.ndarray  # (2,) detector pixels (u, v)
    dDetector: np.ndarray  # (2,) pixel pitch
    sDetector: np.ndarray  # (2,) physical detector size
    nVoxel: np.ndarray  # (3,) voxels, reversed (z, y, x)
    dVoxel: np.ndarray  # (3,) voxel pitch (x, y, z)
    sVoxel: np.ndarray  # (3,) physical volume extent (reversed order * pitch)
    offOrigin: np.ndarray  # (3,) volume offset from isocenter
    offDetector: np.ndarray  # (3,) detector offset
    accuracy: float = 0.5
    mode: str = "cone"
    filter: Optional[str] = None

    @classmethod
    def from_dict(cls, data: dict, scale_factor: float = SCALE_FACTOR) -> "ConeGeometry":
        n_detector = np.asarray(data["nDetector"])
        d_detector = np.asarray(data["dDetector"], dtype=np.float64) * scale_factor
        n_voxel = np.asarray(data["nVoxel"])[::-1]
        d_voxel = np.asarray(data["dVoxel"], dtype=np.float64) * scale_factor
        off_det = data["offDetector"]
        return cls(
            DSD=float(data["DSD"]) * scale_factor,
            DSO=float(data["DSO"]) * scale_factor,
            nDetector=n_detector,
            dDetector=d_detector,
            sDetector=n_detector * d_detector,
            nVoxel=n_voxel,
            dVoxel=d_voxel,
            sVoxel=n_voxel * d_voxel,
            offOrigin=np.asarray(data["offOrigin"], dtype=np.float64) * scale_factor,
            offDetector=np.asarray([off_det[0], off_det[1], 0], dtype=np.float64)
            * scale_factor,
            accuracy=float(data.get("accuracy", 0.5)),
            mode=data.get("mode", "cone"),
            filter=data.get("filter"),
        )

    def to_info_dict(self) -> dict:
        """Flat dict consumed by ray generation (the ``general.json`` shape)."""
        return {
            "DSD": self.DSD,
            "DSO": self.DSO,
            "nDetector": self.nDetector.tolist(),
            "dDetector": self.dDetector.tolist(),
            "nVoxel": self.nVoxel[::-1].tolist(),
            "dVoxel": self.dVoxel.tolist(),
            "offOrigin": self.offOrigin.tolist(),
            "offDetector": self.offDetector.tolist(),
            "accuracy": self.accuracy,
            "mode": self.mode,
            "filter": self.filter,
        }


def get_near_far(geo: ConeGeometry, adjust: float = 0.0) -> tuple[float, float]:
    """Geometric near/far sampling bounds from the volume footprint corners.

    Matches ``preprocess/tigre_helpers.py:44-56`` (itself credited to
    naf_cbct): the max distance from the isocenter offset to the four
    in-plane volume corners bounds the reconstructable region around DSO.
    """
    half = geo.sVoxel / 2
    corners = [
        [geo.offOrigin[0] - half[0], geo.offOrigin[1] - half[1]],
        [geo.offOrigin[0] - half[0], geo.offOrigin[1] + half[1]],
        [geo.offOrigin[0] + half[0], geo.offOrigin[1] - half[1]],
        [geo.offOrigin[0] + half[0], geo.offOrigin[1] + half[1]],
    ]
    dist_max = max(np.linalg.norm(c) for c in corners)
    near = max(0.0, geo.DSO - dist_max - adjust)
    far = min(geo.DSO * 2, geo.DSO + dist_max + adjust)
    return float(near), float(far)


def xcat_geometry(data_size: int, vol_dimensions: Sequence[int]) -> dict:
    """XCAT phantom acquisition preset (``preprocess/tigre_helpers.py:140-173``)."""
    if data_size == 200:
        n_det, d_det = [200, 200], [1, 1]
    elif data_size == 50:
        n_det, d_det = [50, 50], [4, 4]
    else:
        raise ValueError(f"unknown XCAT data_size {data_size}; expected 200 or 50")
    return {
        "DSD": 2500,
        "DSO": 450,
        "nDetector": n_det,
        "dDetector": d_det,
        "nVoxel": list(vol_dimensions),
        "dVoxel": [0.25, 0.25, 0.25],
        "offOrigin": [10, -25, 25],
        "offDetector": [0, 0],
        "accuracy": 0.5,
        "mode": "cone",
        "filter": None,
    }


def synth_geometry(data_size: int, vol_dimensions: Sequence[int]) -> dict:
    """Geometry for the built-in synthetic phantom (no reference analog).

    XCAT's source/detector distances, but the voxel pitch scales with the
    grid so the phantom always spans ~128 mm (the XCAT volume's in-plane
    extent, 512 x 0.25 mm) regardless of resolution, and sits centered at
    the isocenter.
    """
    if data_size == 200:
        n_det, d_det = [200, 200], [1, 1]
    elif data_size == 50:
        n_det, d_det = [50, 50], [4, 4]
    else:
        raise ValueError(f"unknown SYNTH data_size {data_size}; expected 200 or 50")
    pitch = 128.0 / max(vol_dimensions)
    return {
        "DSD": 2500,
        "DSO": 450,
        "nDetector": n_det,
        "dDetector": d_det,
        "nVoxel": list(vol_dimensions),
        "dVoxel": [pitch, pitch, pitch],
        "offOrigin": [0, 0, 0],
        "offDetector": [0, 0],
        "accuracy": 0.5,
        "mode": "cone",
        "filter": None,
    }


def ccta_geometry(data_size: int, vol_dimensions: Sequence[int]) -> dict:
    """MAGIX/CCTA acquisition preset (``preprocess/tigre_helpers.py:175-206``)."""
    if data_size == 200:
        n_det, d_det = [200, 200], [1, 1]
    elif data_size == 50:
        n_det, d_det = [50, 50], [4, 4]
    else:
        raise ValueError(f"unknown CCTA data_size {data_size}; expected 200 or 50")
    return {
        "DSD": 2000,
        "DSO": 600,
        "nDetector": n_det,
        "dDetector": d_det,
        "nVoxel": list(vol_dimensions),
        "dVoxel": [0.9, 0.9, 0.9],
        "offOrigin": [0, 0, 0],
        "offDetector": [0, 0],
        "accuracy": 0.5,
        "mode": "cone",
        "filter": None,
    }
