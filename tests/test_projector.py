"""Cone-beam projector tests: scipy ground truth + analytic phantoms
(replaces TIGRE ``Ax``; reference math: ``preprocess/proj_helpers.py:84-115``)."""

import jax.numpy as jnp
import numpy as np

from nerfca_tpu.data.phantom import synthetic_phantom_volume
from nerfca_tpu.geometry.cone import (
    MAX_PIXEL_VALUE,
    ConeGeometry,
    get_near_far,
    synth_geometry,
)
from nerfca_tpu.geometry.rays import detector_rays
from nerfca_tpu.ops.projector import (
    project_view,
    transmission_image,
    trilinear_sample,
    world_to_voxel,
)


def make_info(vol_shape, size=50):
    geo = ConeGeometry.from_dict(synth_geometry(size, list(vol_shape)))
    info = geo.to_info_dict()
    near, far = get_near_far(geo)
    info["near_thresh"], info["far_thresh"] = near, far
    return geo, info


def test_trilinear_exact_at_voxels():
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(size=(5, 6, 7)).astype(np.float32))
    pts = jnp.array([[1.0, 2.0, 3.0], [0.0, 0.0, 0.0], [4.0, 5.0, 6.0]])
    got = np.asarray(trilinear_sample(vol, pts))
    want = [vol[1, 2, 3], vol[0, 0, 0], vol[4, 5, 6]]
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-6)


def test_trilinear_interpolates_midpoints():
    vol = jnp.zeros((3, 3, 3)).at[1, 1, 1].set(8.0)
    got = float(trilinear_sample(vol, jnp.array([[0.5, 1.0, 1.0]]))[0])
    np.testing.assert_allclose(got, 4.0, atol=1e-6)
    got = float(trilinear_sample(vol, jnp.array([[0.5, 0.5, 0.5]]))[0])
    np.testing.assert_allclose(got, 1.0, atol=1e-6)


def test_trilinear_zero_outside():
    vol = jnp.ones((4, 4, 4))
    pts = jnp.array([[-0.5, 1.0, 1.0], [1.0, 1.0, 5.0], [3.5, 1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(trilinear_sample(vol, pts)), 0.0)


def test_world_to_voxel_center():
    # volume center must land at index (n-1)/2 shifted by reversed offOrigin
    idx = world_to_voxel(
        jnp.array([[0.25, -0.25, 0.1]]), (9, 9, 9), (0.1, 0.1, 0.1), (0.1, -0.25, 0.25)
    )
    np.testing.assert_allclose(np.asarray(idx)[0], [4.0, 4.0, 4.0], atol=1e-6)


def test_uniform_cube_line_integral():
    """A uniform cube: the central ray's integral equals mu * chord length."""
    n = 33
    mu = 0.5
    vol = np.full((n, n, n), mu, np.float32)
    geo, info = make_info(vol.shape)
    img = np.asarray(project_view(vol, info, 0.0, 0.0, n_samples=2000))
    # central pixel ray passes straight through the cube: chord = sVoxel edge
    # in the ray direction (volume is a cube of edge sVoxel)
    # NOTE the grid spans (n-1) voxel pitches for interpolation purposes; the
    # outermost half-voxels taper linearly, so effective chord ~ (n-1)*d
    chord = (n - 1) * geo.dVoxel[0]
    center = img[img.shape[0] // 2, img.shape[1] // 2]
    np.testing.assert_allclose(center, mu * chord, rtol=0.02)


def test_projection_matches_scipy_interpolator():
    from scipy.interpolate import RegularGridInterpolator

    vol = synthetic_phantom_volume(size=24, phase=0.2)
    geo, info = make_info(vol.shape)
    img = np.asarray(project_view(vol, info, -30.0, 30.0, n_samples=128))

    o, d = detector_rays(-30.0, 30.0, 0.0, info)
    o, d = np.asarray(o), np.asarray(d)
    z = np.linspace(info["near_thresh"], info["far_thresh"], 128)
    axes = [
        (np.arange(s) - (s - 1) / 2) * geo.dVoxel[i] + np.asarray(info["offOrigin"])[::-1][i]
        for i, s in enumerate(vol.shape)
    ]
    interp = RegularGridInterpolator(axes, vol, bounds_error=False, fill_value=0.0)
    dists = np.diff(z)
    dists = np.concatenate([dists, [1e-10]])
    for a, b in [(25, 25), (5, 44), (44, 5), (12, 30)]:
        pts = o[a, b][None, :] + d[a, b][None, :] * z[:, None]
        ref = float((interp(pts) * dists).sum())
        np.testing.assert_allclose(img[a, b], ref, atol=2e-3, err_msg=f"ray {a},{b}")


def test_projection_sees_dynamic_vessel():
    """Different cardiac phases must give measurably different projections."""
    geo, info = None, None
    imgs = []
    for phase in (0.0, 0.5):
        vol = synthetic_phantom_volume(size=24, phase=phase)
        if info is None:
            geo, info = make_info(vol.shape)
        imgs.append(np.asarray(project_view(vol, info, -30.0, 30.0, n_samples=128)))
    diff = np.abs(imgs[0] - imgs[1])
    assert diff.max() > 0.01  # the vessel moved
    # but the background dominates: most pixels barely change
    assert np.median(diff) < diff.max() / 5


def test_mip_mode():
    vol = synthetic_phantom_volume(size=24, phase=0.0)
    _, info = make_info(vol.shape)
    mip = np.asarray(project_view(vol, info, 0.0, 0.0, n_samples=128, mode="mip"))
    # MIP of a phantom containing the vessel value must reach near it
    assert mip.max() > 0.5 * vol.max()
    assert mip.max() <= vol.max() + 1e-5


def test_transmission_image_roundtrip():
    line = np.array([[0.0, 0.5], [1.0, 2.0]])
    norm, mn, mx = transmission_image(line, MAX_PIXEL_VALUE)
    assert norm.min() == 0.0 and norm.max() == 1.0
    # denormalize: norm * (mx - mn) + mn == log(MAX) - line
    recon = norm * (mx - mn) + mn
    np.testing.assert_allclose(recon, np.log(MAX_PIXEL_VALUE) - line, atol=1e-9)


def test_transmission_constant_image():
    norm, mn, mx = transmission_image(np.full((4, 4), 0.7), MAX_PIXEL_VALUE)
    assert mn == mx
    np.testing.assert_allclose(norm, 0.0)
