"""Native C++ projector vs the XLA projector (independent implementations
of the same math must agree)."""

import numpy as np
import pytest

from nerfca_tpu.data import native
from nerfca_tpu.data.phantom import synthetic_phantom_volume
from nerfca_tpu.geometry.cone import ConeGeometry, get_near_far, synth_geometry
from nerfca_tpu.ops.projector import project_view

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native projector did not build"
)


def make_info(vol_shape):
    geo = ConeGeometry.from_dict(synth_geometry(50, list(vol_shape)))
    info = geo.to_info_dict()
    info["near_thresh"], info["far_thresh"] = get_near_far(geo)
    return info


def test_native_matches_xla_ct():
    vol = synthetic_phantom_volume(size=24, phase=0.4)
    info = make_info(vol.shape)
    for theta, phi in [(-30.0, 30.0), (0.0, 0.0), (60.0, -30.0)]:
        xla_img = np.asarray(project_view(vol, info, theta, phi, n_samples=96))
        cpp_img = native.native_project_view(vol, info, theta, phi, n_samples=96)
        np.testing.assert_allclose(
            cpp_img, xla_img, atol=1e-4, err_msg=f"view {theta},{phi}"
        )


def test_native_matches_xla_mip():
    vol = synthetic_phantom_volume(size=24, phase=0.0)
    info = make_info(vol.shape)
    xla_img = np.asarray(
        project_view(vol, info, -30.0, 30.0, n_samples=96, mode="mip")
    )
    cpp_img = native.native_project_view(
        vol, info, -30.0, 30.0, n_samples=96, mode="mip"
    )
    np.testing.assert_allclose(cpp_img, xla_img, atol=1e-5)


def test_native_threads_reported():
    import ctypes

    lib = native._load()
    assert lib.cone_projector_num_threads() >= 1
