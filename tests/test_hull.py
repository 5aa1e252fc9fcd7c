"""Motion-hull prior (ops/hull.py): inverse projection, trilinear gate,
carving correctness, and fused-kernel parity of the gated path."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nerfca_tpu.ops.pallas.fused_field as ff
from nerfca_tpu.geometry.cone import ConeGeometry, synth_geometry, xcat_geometry
from nerfca_tpu.geometry.rays import detector_rays
from nerfca_tpu.ops.hull import (
    MotionHull,
    _project_to_pixels,
    build_motion_hull,
    hull_gate,
    hull_gate_rays,
)


def _info():
    geo = ConeGeometry.from_dict(xcat_geometry(50, [64, 64, 64]))
    return geo.to_info_dict()


def test_project_to_pixels_inverts_detector_rays():
    """A point along the ray of pixel (a, b) must project back to (a, b)
    — the inverse of geometry.rays.detector_rays, NOT a parallel
    reimplementation (validated against the forward model)."""
    info = _info()
    for theta, phi in [(0.0, 0.0), (30.0, 0.0), (-40.0, 20.0), (90.0, 0.0)]:
        origins, dirs = detector_rays(theta, phi, 0.0, info)
        o = np.asarray(origins).reshape(-1, 3)
        d = np.asarray(dirs).reshape(-1, 3)
        for t in (3.8, 4.5, 5.1):
            pts = o + t * d
            a, b = _project_to_pixels(pts, theta, phi, 0.0, info)
            w, h = (int(x) for x in info["nDetector"])
            aa, bb = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
            np.testing.assert_allclose(a, aa.reshape(-1), atol=1e-3)
            np.testing.assert_allclose(b, bb.reshape(-1), atol=1e-3)


def _random_hull(key, res=8):
    grid = jax.random.uniform(key, (res, res, res))
    return MotionHull(
        grid=grid,
        d_voxel=jnp.asarray([0.25, 0.25, 0.25]),
        off=jnp.asarray([0.0, 0.1, -0.1]),
    )


def test_hull_gate_trilinear_matches_numpy():
    hull = _random_hull(jax.random.PRNGKey(0))
    res = hull.grid.shape[0]
    rng = np.random.default_rng(1)
    # stay strictly inside the grid extent
    half = (res - 1) / 2 * 0.25 * 0.98
    x = rng.uniform(-half, half, 200) + 0.0
    y = rng.uniform(-half, half, 200) + 0.1
    z = rng.uniform(-half, half, 200) - 0.1

    got = np.asarray(hull_gate(hull, jnp.asarray(x), jnp.asarray(y), jnp.asarray(z)))

    from scipy.ndimage import map_coordinates

    gx = (x - 0.0) / 0.25 + (res - 1) / 2
    gy = (y - 0.1) / 0.25 + (res - 1) / 2
    gz = (z + 0.1) / 0.25 + (res - 1) / 2
    want = map_coordinates(np.asarray(hull.grid), [gx, gy, gz], order=1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_hull_gate_outside_is_zero():
    hull = _random_hull(jax.random.PRNGKey(2))
    far = jnp.asarray([10.0, -10.0, 3.0])
    out = hull_gate(hull, far, jnp.zeros(3), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out)[:2], 0.0)


def test_hull_gate_exact_far_face_is_finite():
    """MAGIX-SURR collapse regression (scripts/magix_gate_probe3.py): a
    sample landing EXACTLY on the far grid face (gx == res-1, f32) used to
    base the trilinear cell at res-1, gather the +1 corner out of range,
    and jnp.take's default NaN-fill leaked through `NaN * fx(=0)` — one
    such sample per step-60 batch NaN'd the whole MAGIX run. The base cell
    must clamp to res-2 and the boundary value must equal the face value."""
    hull = _random_hull(jax.random.PRNGKey(7), res=96)
    res = hull.grid.shape[0]
    # world coordinate that maps to grid coord exactly res-1 on each axis
    def world(axis, g):
        d = float(hull.d_voxel[axis])
        off = float(hull.off[axis])
        return jnp.float32((g - (res - 1) / 2) * d + off)

    x = world(0, res - 1)
    y = world(1, 40.5)
    z = world(2, 12.25)
    got = np.asarray(hull_gate(hull, x[None], y[None], z[None]))
    assert np.isfinite(got).all()
    from scipy.ndimage import map_coordinates

    want = map_coordinates(
        np.asarray(hull.grid), [[res - 1], [40.5], [12.25]], order=1
    )
    np.testing.assert_allclose(got, want, atol=1e-5)
    # the all-axes far corner, and one just past it (out of bounds -> 0)
    corner = np.asarray(
        hull_gate(hull, world(0, res - 1)[None], world(1, res - 1)[None],
                  world(2, res - 1)[None])
    )
    np.testing.assert_allclose(corner, np.asarray(hull.grid)[-1, -1, -1],
                               atol=1e-5)
    past = np.asarray(
        hull_gate(hull, world(0, res - 1 + 1e-2)[None], y[None], z[None])
    )
    np.testing.assert_allclose(past, 0.0)


def test_hull_gate_rays_matches_pointwise():
    hull = _random_hull(jax.random.PRNGKey(3))
    rng = np.random.default_rng(4)
    origins = jnp.asarray(rng.normal(0, 0.3, (5, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.normal(0, 0.2, (5, 3)).astype(np.float32))
    z = jnp.linspace(0.0, 1.5, 7)
    got = hull_gate_rays(hull, origins, dirs, z)
    assert got.shape == (5, 7)
    pts_x = origins[:, 0:1] + dirs[:, 0:1] * z[None, :]
    pts_y = origins[:, 1:2] + dirs[:, 1:2] * z[None, :]
    pts_z = origins[:, 2:3] + dirs[:, 2:3] * z[None, :]
    want = hull_gate(hull, pts_x, pts_y, pts_z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_carving_localizes_a_moving_ball(tmp_path):
    """Variance maps = analytic projections of a ball at p0; the carved
    hull must be occupied at p0 and empty at a distant point that every
    view sees as static."""
    # synth preset: the phantom spans ~1.28 world units, but the detector
    # FOV at the isocenter is only ~±0.18 (200 mm detector, 5.6x
    # magnification) — both probe points must sit inside it
    info = ConeGeometry.from_dict(synth_geometry(50, [64, 64, 64])).to_info_dict()
    p0 = np.array([0.08, -0.06, 0.05])
    p_far = np.array([-0.12, 0.1, -0.1])
    views = [(0.0, 0.0), (40.0, 0.0), (-40.0, 0.0), (90.0, 0.0)]
    w, h = (int(x) for x in info["nDetector"])

    frames = []
    for i, (theta, phi) in enumerate(views):
        origins, dirs = detector_rays(theta, phi, 0.0, info)
        o = np.asarray(origins).reshape(-1, 3)
        d = np.asarray(dirs).reshape(-1, 3)
        dn = d / np.linalg.norm(d, axis=1, keepdims=True)
        # pixel moves iff its ray passes within r of the ball center
        rel = p0[None, :] - o
        dist = np.linalg.norm(rel - (rel * dn).sum(1, keepdims=True) * dn, axis=1)
        moving = (dist < 0.06).astype(np.float64).reshape(w, h)
        # on-disk contract: transposed, weight = var + 1 (dataset.py)
        path = tmp_path / f"w{i}.npy"
        np.save(path, moving.T.reshape(-1) + 1.0)
        frames.append(
            {"theta": theta, "phi": phi, "weighted_file_path": str(path)}
        )

    hull = build_motion_hull(frames, info, res=48, thresh=0.3, dilate=1,
                             sigma=0.5)
    assert hull is not None
    g0 = float(hull_gate(hull, jnp.asarray(p0[0]), jnp.asarray(p0[1]),
                         jnp.asarray(p0[2])))
    gf = float(hull_gate(hull, jnp.asarray(p_far[0]), jnp.asarray(p_far[1]),
                         jnp.asarray(p_far[2])))
    assert g0 > 0.9, g0
    assert gf < 0.05, gf
    # the hull is a visual-hull superset of the ball but still sparse
    occ = float(np.mean(np.asarray(hull.grid) > 0.5))
    assert 0.0 < occ < 0.2, occ


def test_missing_variance_maps_return_none(tmp_path):
    info = _info()
    frames = [{"theta": 0.0, "phi": 0.0,
               "weighted_file_path": str(tmp_path / "nope.npy")}]
    assert build_motion_hull(frames, info) is None


def test_fused_train_hull_matches_unfused(monkeypatch):
    """The gated monolithic kernel (hull riding in geometry row 7) matches
    composite_loss_fn + jax.grad with the same hull, and differs from the
    ungated loss (the gate actually bites)."""
    monkeypatch.setattr(ff, "_INTERPRET", True)
    from tests.test_fused_train import _setup
    from nerfca_tpu.ops.encoding import free_window_mask
    from nerfca_tpu.ops.pallas.fused_train import fused_train_loss_and_grads
    from nerfca_tpu.train.step import composite_loss_fn, loss_weights

    params, cfgs, hp, batch, z = _setup()
    # grid covering the sampled region (origin [4.5,0,0], dirs ~ -x,
    # depths 3.6-5.4 -> x in [-0.9, 0.9], y/z small) with smooth values
    key = jax.random.PRNGKey(9)
    hull = MotionHull(
        grid=0.2 + 0.8 * jax.random.uniform(key, (6, 6, 6)),
        d_voxel=jnp.asarray([0.5, 0.5, 0.5]),
        off=jnp.asarray([0.0, 0.0, 0.0]),
    )
    step = jnp.asarray(57)

    def ref_loss(p):
        return composite_loss_fn(p, batch, z, step, cfgs, hp, hull=hull)

    (ref_l, ref_m), ref_g = jax.value_and_grad(ref_loss, has_aux=True)(params)
    ungated_l, _ = composite_loss_fn(params, batch, z, step, cfgs, hp)
    assert not np.isclose(float(ref_l), float(ungated_l))

    w = loss_weights(step, hp)
    lw = jnp.stack([w["favor_s"], w["dynamic_entro"], w["occl"], w["l1"]])
    window = free_window_mask(4, 57, 100, 1)
    loss, terms, g_s, g_t = fused_train_loss_and_grads(
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], window, window, lw, hp,
        hull=hull,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    flat_f = jax.tree_util.tree_flatten_with_path(
        {"static": g_s, "temp": g_t}
    )[0]
    flat_r = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_g)[0]
    )
    for path, a in flat_f:
        b = flat_r[jax.tree_util.keystr(path)]
        scale = max(float(jnp.abs(b).max()), 1e-10)
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 5e-4, (jax.tree_util.keystr(path), err, scale)


def test_train_composite_with_hull_runs(tmp_path):
    """End-to-end: --use_motion_hull carves from the SYNTH variance maps
    and trains without error; eval artifacts exist."""
    from nerfca_tpu.train.config import parse_args
    from nerfca_tpu.train.trainer import train_composite

    argv = [
        "--config", "configs/synth-small.txt",
        "--data_root", str(tmp_path / "data"),
        "--log_dir_root", str(tmp_path / "cases"),
        "--synth_vol_size", "20",
        "--depth_samples_per_ray_coarse", "32",
        "--img_sample_size", "32",
        "--steps_per_chunk", "10",
        "--n_iters", "20",
        "--display_every", "20",
        "--save_every", "20",
        "--log_every", "10",
        "--lr_decay_steps", "20",
        "--static_pos_enc_window_decay_steps", "20",
        "--temp_pos_enc_window_decay_steps", "20",
        "--hyperparam_decay_steps", "20",
        "--use_motion_hull", "True",
        "--hull_res", "32",
    ]
    args = parse_args(argv)
    out = train_composite(args)
    assert int(out["state"].step) == 21
    assert out["setup"]["hull"] is not None
    rec = json.load(open(f"{out['log_dir']}/config.json"))
    assert rec  # config written


def test_hull_args_record_roundtrip_and_override_warning():
    """The checkpoint-persisted hull record restores the training-time
    gating configuration at eval time; CLI mismatches warn but the stored
    record wins (ADVICE r3: the gate is part of the model)."""
    import warnings
    from types import SimpleNamespace

    from nerfca_tpu.ops.hull import apply_hull_args_record, hull_args_record

    trained = SimpleNamespace(
        use_motion_hull=True, hull_res=64, hull_thresh=0.05,
        hull_dilate=1, hull_sigma=0.0,
    )
    rec = hull_args_record(trained)
    assert rec == {
        "use_motion_hull": True, "hull_res": 64, "hull_thresh": 0.05,
        "hull_dilate": 1, "hull_sigma": 0.0,
    }

    # eval args at their CLI defaults (hull off) -> stored record wins + warns
    eval_args = SimpleNamespace(
        use_motion_hull=False, hull_res=96, hull_thresh=0.02,
        hull_dilate=3, hull_sigma=1.0,
    )
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        apply_hull_args_record(eval_args, rec)
        assert any("use_motion_hull" in str(w.message) for w in caught)
    assert eval_args.use_motion_hull is True
    assert eval_args.hull_res == 64
    assert eval_args.hull_sigma == 0.0

    # matching args apply silently
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        apply_hull_args_record(eval_args, rec)
        assert not caught


def test_build_motion_hull_rejects_rectangular_detector():
    import numpy as np
    import pytest

    from nerfca_tpu.ops.hull import build_motion_hull

    info = {"nDetector": [64, 32]}
    with pytest.raises(AssertionError, match="square"):
        build_motion_hull(
            [{"theta": 0.0, "phi": 0.0, "weighted_file_path": "x.npy"}],
            info,
        )


def test_hull_static_l1_fused_matches_unfused(monkeypatch):
    """The hull-gated static L1 (framework extension, VERDICT r4 contrast
    work): the fused kernel's 5th weight slot must reproduce the XLA
    path's loss and grads, the term must BITE (loss differs from the
    zero-weight loss), and without a hull it must vanish in both paths."""
    import dataclasses

    monkeypatch.setattr(ff, "_INTERPRET", True)
    from tests.test_fused_train import _setup
    from nerfca_tpu.ops.encoding import free_window_mask
    from nerfca_tpu.ops.pallas.fused_train import fused_train_loss_and_grads
    from nerfca_tpu.train.step import composite_loss_fn, loss_weights

    params, cfgs, hp, batch, z = _setup()
    hp = dataclasses.replace(
        hp, hull_static_l1_weight_start=1e-3, hull_static_l1_weight_end=1e-3
    )
    key = jax.random.PRNGKey(11)
    hull = MotionHull(
        grid=0.2 + 0.8 * jax.random.uniform(key, (6, 6, 6)),
        d_voxel=jnp.asarray([0.5, 0.5, 0.5]),
        off=jnp.asarray([0.0, 0.0, 0.0]),
    )
    step = jnp.asarray(57)

    def ref_loss(p, h):
        return composite_loss_fn(p, batch, z, step, cfgs, hp, hull=h)

    (ref_l, ref_m), ref_g = jax.value_and_grad(
        ref_loss, has_aux=True
    )(params, hull)
    assert float(ref_m["train_hull_s_l1"]) > 0.0

    # the term bites: zero-weight loss differs
    hp0 = dataclasses.replace(
        hp, hull_static_l1_weight_start=0.0, hull_static_l1_weight_end=0.0
    )
    l0, _ = composite_loss_fn(params, batch, z, step, cfgs, hp0, hull=hull)
    assert not np.isclose(float(ref_l), float(l0))

    w = loss_weights(step, hp)
    lw = jnp.stack([w["favor_s"], w["dynamic_entro"], w["occl"], w["l1"],
                    w["hull_static_l1"]])
    window = free_window_mask(4, 57, 100, 1)
    loss, terms, g_s, g_t = fused_train_loss_and_grads(
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], window, window, lw, hp,
        hull=hull,
    )
    np.testing.assert_allclose(float(loss), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(
        float(terms["hull_s_l1"]), float(ref_m["train_hull_s_l1"]),
        rtol=1e-5,
    )
    flat_f = jax.tree_util.tree_flatten_with_path(
        {"static": g_s, "temp": g_t}
    )[0]
    flat_r = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(ref_g)[0]
    )
    for path, a in flat_f:
        b = flat_r[jax.tree_util.keystr(path)]
        scale = max(float(jnp.abs(b).max()), 1e-10)
        err = float(jnp.abs(a - b).max()) / scale
        assert err < 5e-4, (jax.tree_util.keystr(path), err, scale)

    # no hull: the term is 0 in the XLA path AND the fused kernel (whose
    # all-ones gate row would otherwise turn it into a plain static L1)
    lq, mq = composite_loss_fn(params, batch, z, step, cfgs, hp)
    assert float(mq["train_hull_s_l1"]) == 0.0
    loss_nh, terms_nh, _, _ = fused_train_loss_and_grads(
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], window, window, lw, hp,
    )
    assert float(terms_nh["hull_s_l1"]) == 0.0
    np.testing.assert_allclose(float(loss_nh), float(lq), rtol=1e-5)
