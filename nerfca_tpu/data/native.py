"""ctypes bindings for the native C++ cone-beam projector.

Builds ``native/libcone_projector.so`` on first use (``make`` in the
``native/`` directory) and exposes :func:`native_project_view` with the
same contract as ``nerfca_tpu.ops.projector.project_view``. Used as an
independent cross-check of the XLA projector and as a no-accelerator
dataset-generation path. Falls back cleanly (``is_available()`` False) when
no C++ toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from nerfca_tpu.geometry.rays import detector_rays

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libcone_projector.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.isfile(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True,
                    capture_output=True,
                    timeout=120,
                )
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.cone_project.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # volume
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),  # origins
            ctypes.POINTER(ctypes.c_float),  # dirs
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),  # depths
            ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_float,  # dvoxel
            ctypes.c_float, ctypes.c_float, ctypes.c_float,  # off (xyz)
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),  # out
        ]
        lib.cone_project.restype = None
        lib.cone_projector_num_threads.restype = ctypes.c_int
        _lib = lib
        return _lib


def is_available() -> bool:
    return _load() is not None


def native_project_view(
    volume: np.ndarray,
    geo_info: dict,
    theta_deg: float,
    phi_deg: float,
    larm_deg: float = 0.0,
    n_samples: int = 1000,
    mode: str = "ct",
) -> np.ndarray:
    """Project one view with the C++ projector; same contract as
    ``ops.projector.project_view`` (returns the ``[W, H]`` image)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native projector unavailable (build failed)")

    origins, dirs = detector_rays(theta_deg, phi_deg, larm_deg, geo_info)
    o = np.ascontiguousarray(np.asarray(origins), np.float32).reshape(-1, 3)
    d = np.ascontiguousarray(np.asarray(dirs), np.float32).reshape(-1, 3)
    w, h = (int(v) for v in geo_info["nDetector"])
    vol = np.ascontiguousarray(volume, np.float32)
    depths = np.linspace(
        float(geo_info["near_thresh"]), float(geo_info["far_thresh"]), n_samples
    ).astype(np.float32)
    off = np.asarray(geo_info["offOrigin"], np.float64)[::-1]
    dv = np.asarray(geo_info["dVoxel"], np.float64)
    out = np.zeros(o.shape[0], np.float32)

    fp = ctypes.POINTER(ctypes.c_float)
    lib.cone_project(
        vol.ctypes.data_as(fp),
        *vol.shape,
        o.ctypes.data_as(fp),
        d.ctypes.data_as(fp),
        ctypes.c_int64(o.shape[0]),
        depths.ctypes.data_as(fp),
        n_samples,
        ctypes.c_float(dv[0]), ctypes.c_float(dv[1]), ctypes.c_float(dv[2]),
        ctypes.c_float(off[0]), ctypes.c_float(off[1]), ctypes.c_float(off[2]),
        1 if mode == "mip" else 0,
        out.ctypes.data_as(fp),
    )
    return out.reshape(w, h)
