"""Geometry golden tests: rotation conventions, poses, detector rays.

Golden values are hand-derived from the reference formulas
(``train/proj_helpers.py:5-90``, ``preprocess/tigre_helpers.py:11-56``).
"""

import numpy as np
import pytest

from nerfca_tpu.geometry import (
    ConeGeometry,
    carm_rotation,
    carm_source_matrix,
    detector_rays,
    get_near_far,
    rot_x,
    rot_y,
    rot_z,
    roadmap_rotation,
    translation,
    xcat_geometry,
    ccta_geometry,
)


def test_rotation_primitives_orthonormal():
    for m in (rot_x(0.3), rot_y(-1.2), rot_z(2.5)):
        r = m[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
        assert np.isclose(np.linalg.det(r), 1.0)


def test_rot_z_quarter_turn():
    m = rot_z(np.pi / 2)
    np.testing.assert_allclose(m[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_translation():
    m = translation([1, 2, 3])
    np.testing.assert_allclose(m @ [0, 0, 0, 1], [1, 2, 3, 1])


def test_carm_identity_angles():
    """theta=phi=0: R = Rz(pi/2) Rx(-pi/2).

    Hand-derived: Rx(-pi/2) maps [0,0,-d] -> [0,-d,0]; Rz(pi/2) maps that to
    [d,0,0]. The optical axis +z maps to [0,1,0] then to [-1,0,0] — the
    central ray points from the source back through the isocenter."""
    pose = carm_source_matrix(0.0, 0.0, dso=4.5)
    np.testing.assert_allclose(pose[:3, 3], [4.5, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(pose[:3, :3] @ [0, 0, 1], [-1, 0, 0], atol=1e-12)


def test_carm_theta_90():
    """theta=90 (LAO): Rz(-90deg) Rz(90) Rx(0) Rx(-90) = Rx(-90)."""
    r = carm_rotation(90.0, 0.0)
    np.testing.assert_allclose(r[:3, :3], rot_x(-np.pi / 2)[:3, :3], atol=1e-12)


def test_carm_matches_reference_composition():
    theta, phi = 33.0, -17.0
    expected = (
        rot_z(-np.deg2rad(theta))
        @ rot_z(np.pi / 2)
        @ rot_x(np.deg2rad(phi))
        @ rot_x(-np.pi / 2)
    )
    np.testing.assert_allclose(carm_rotation(theta, phi), expected, atol=1e-12)


def test_preprocess_train_conventions_agree():
    """preprocess uses Rz(+theta) called with -theta (datatoray.py:105) ==
    train's Rz(-theta); our single convention must equal both."""
    theta, phi = 42.0, 13.0
    pre = (
        rot_z(np.deg2rad(-theta))
        @ rot_z(np.pi / 2)
        @ rot_x(np.deg2rad(phi))
        @ rot_x(-np.pi / 2)
    )
    np.testing.assert_allclose(carm_rotation(theta, phi), pre, atol=1e-12)


def test_roadmap_rotation_inverse():
    r = roadmap_rotation(10.0, 20.0, 5.0)
    fwd = rot_z(np.deg2rad(5.0)) @ rot_x(np.deg2rad(10.0)) @ rot_y(np.deg2rad(20.0))
    np.testing.assert_allclose(r @ fwd, np.eye(4), atol=1e-12)


def test_cone_geometry_scaling_and_reversal():
    geo = ConeGeometry.from_dict(xcat_geometry(200, [512, 512, 401]))
    assert np.isclose(geo.DSD, 25.0)
    assert np.isclose(geo.DSO, 4.5)
    np.testing.assert_array_equal(geo.nVoxel, [401, 512, 512])  # reversed
    np.testing.assert_allclose(geo.dVoxel, [0.0025, 0.0025, 0.0025])
    np.testing.assert_allclose(geo.offOrigin, [0.1, -0.25, 0.25])
    np.testing.assert_allclose(geo.sVoxel, geo.nVoxel * geo.dVoxel)


def test_near_far_bounds():
    geo = ConeGeometry.from_dict(xcat_geometry(200, [512, 512, 401]))
    near, far = get_near_far(geo)
    assert 0 < near < geo.DSO < far < 2 * geo.DSO
    # symmetric about DSO
    assert np.isclose((near + far) / 2, geo.DSO) or near == 0.0
    # hand-computed: sVoxel = [401,512,512]*0.0025 = [1.0025, 1.28, 1.28]
    half = geo.sVoxel / 2
    dmax = max(
        np.hypot(geo.offOrigin[0] + sx * half[0], geo.offOrigin[1] + sy * half[1])
        for sx in (-1, 1)
        for sy in (-1, 1)
    )
    assert np.isclose(near, geo.DSO - dmax)
    assert np.isclose(far, geo.DSO + dmax)


def test_detector_rays_shapes_and_center():
    info = ConeGeometry.from_dict(xcat_geometry(50, [512, 512, 401])).to_info_dict()
    origins, dirs = detector_rays(0.0, 0.0, 0.0, info)
    assert origins.shape == (50, 50, 3)
    assert dirs.shape == (50, 50, 3)
    o = np.asarray(origins)
    np.testing.assert_allclose(o[0, 0], [info["DSO"], 0.0, 0.0], atol=1e-6)
    # all origins identical (point source)
    assert np.allclose(o, o[0, 0])
    # central rays point from source roughly toward isocenter (-x after pose)
    d = np.asarray(dirs)
    center = d[25, 25] / np.linalg.norm(d[25, 25])
    assert center[0] < -0.99


def test_detector_rays_pixel_mapping():
    """Ray [a, b] must use u=(a+0.5-W/2)du, v=(b+0.5-H/2)dv in the
    unrotated frame (train/proj_helpers.py:79-81)."""
    info = {
        "DSO": 4.5,
        "DSD": 25.0,
        "nDetector": [4, 6],
        "dDetector": [0.04, 0.04],
        "offDetector": [0.0, 0.0, 0.0],
    }
    _, dirs = detector_rays(0.0, 0.0, 0.0, info)
    pose_r = carm_rotation(0.0, 0.0)[:3, :3]
    a, b = 1, 4
    u = (a + 0.5 - 2) * 0.04
    v = (b + 0.5 - 3) * 0.04
    expected = pose_r @ np.array([u / 25.0, v / 25.0, 1.0])
    np.testing.assert_allclose(np.asarray(dirs)[a, b], expected, atol=1e-6)


def test_detector_rays_not_normalized():
    info = ConeGeometry.from_dict(ccta_geometry(50, [100, 100, 100])).to_info_dict()
    _, dirs = detector_rays(10.0, -5.0, 0.0, info)
    norms = np.linalg.norm(np.asarray(dirs), axis=-1)
    # corner rays are longer than 1; depths are measured in this scale
    assert norms.max() > 1.0
    assert np.isclose(norms.min(), 1.0, atol=1e-3)


def test_geometry_presets_validate_sizes():
    with pytest.raises(ValueError):
        xcat_geometry(123, [1, 1, 1])
    with pytest.raises(ValueError):
        ccta_geometry(7, [1, 1, 1])


def test_info_dict_roundtrip():
    data = xcat_geometry(200, [512, 512, 401])
    geo = ConeGeometry.from_dict(data)
    info = geo.to_info_dict()
    # nVoxel roundtrips to the original (x, y, z) order
    assert info["nVoxel"] == [512, 512, 401]
    geo2 = ConeGeometry.from_dict(info, scale_factor=1.0)
    np.testing.assert_allclose(geo2.DSD, geo.DSD)
    np.testing.assert_allclose(geo2.offOrigin, geo.offOrigin)


def test_perspective_rays_roadmap():
    """Pinhole-style roadmap rays (preprocess/proj_helpers.py:48-67)."""
    from nerfca_tpu.geometry import perspective_rays, roadmap_source_matrix

    o, d = perspective_rays(0.0, 0.0, 0.0, [0, 0, 5.0], 8, 6, focal_length=4.0)
    assert o.shape == (6, 8, 3) and d.shape == (6, 8, 3)
    on = np.asarray(o)
    # identity pose: source at [0,0,5]
    np.testing.assert_allclose(on[0, 0], [0, 0, 5.0], atol=1e-6)
    dn = np.asarray(d)
    # pixel (i=4, j=3) is the optical center -> direction -z
    np.testing.assert_allclose(dn[3, 4], [0, 0, -1], atol=1e-6)
    # pixel i=6: +x direction component (i - W/2)/f = 2/4
    np.testing.assert_allclose(dn[3, 6], [0.5, 0, -1], atol=1e-6)
    # pixel j=5: -y component -(j - H/2)/f = -0.5
    np.testing.assert_allclose(dn[5, 4], [0, -0.5, -1], atol=1e-6)

    # a rotated pose applies the roadmap rotation
    o2, d2 = perspective_rays(30.0, 10.0, 5.0, [0, 0, 5.0], 4, 4, 2.0)
    pose = roadmap_source_matrix([0, 0, 5.0], 30.0, 10.0, 5.0)
    np.testing.assert_allclose(np.asarray(o2)[0, 0], pose[:3, 3], atol=1e-5)
