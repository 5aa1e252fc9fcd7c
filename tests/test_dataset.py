"""Dataset builder + loader artifact-contract tests
(reference: ``preprocess/datatoray.py``, ``train/data_helpers.py:129-165``)."""

import argparse
import json
import os

import numpy as np
import pytest

from nerfca_tpu.data.dataset import build_dataset, dataset_paths
from nerfca_tpu.data.loader import denormalize_image, load_dataset, prepare_rays
from nerfca_tpu.data.views import (
    CLINICAL_TEST_ANGLES,
    FOUR_VIEW_PRESET,
    drop_near_test_views,
    grid_angles,
    select_views,
)


def synth_args(tmp_path, **kw):
    base = dict(
        data_name="SYNTH",
        data_size=50,
        synth_vol_size=24,
        data_limited_range=60.0,
        data_step_size=120.0,
        data_numb_angles=4,
        data_time_range_start=0,
        data_time_range_end=2,
        data_limited_range_test=None,
        data_step_size_test=None,
        use_experiment_name=False,
        experiment_name=None,
        volume_root=None,
    )
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ds")
    args = synth_args(tmp)
    paths = build_dataset(args, str(tmp / "data"), projector_samples=64)
    return args, paths


def test_views_grid_and_filtering():
    angles = grid_angles(60, 15)
    assert angles.shape == (81, 2)
    kept = drop_near_test_views(angles, CLINICAL_TEST_ANGLES)
    assert kept.shape[0] < 81
    # every kept angle is >15 deg L1 from every test angle
    d = np.abs(kept[:, None] - CLINICAL_TEST_ANGLES[None]).sum(-1)
    assert (d > 15).all()


def test_views_four_angle_preset():
    phases = select_views(60, 120, numb_angles=4, time_range_end=3)
    assert len(phases) == 3
    np.testing.assert_array_equal(phases[0]["train_viewpoints"], FOUR_VIEW_PRESET)
    np.testing.assert_array_equal(phases[0]["test_viewpoints"], CLINICAL_TEST_ANGLES)
    assert phases[2]["hrt_phase"] == 0.2


def test_views_presets_2_3():
    assert select_views(60, 120, numb_angles=2)[0]["train_viewpoints"].shape == (2, 2)
    assert select_views(60, 120, numb_angles=3)[0]["train_viewpoints"].shape == (3, 2)
    with pytest.raises(ValueError):
        select_views(60, 120, numb_angles=7)


def test_views_selection_view_dedup():
    """A selection view that coincides with an existing test angle must
    replace it, not duplicate it — a duplicated angle would render twice
    in test-*.json and be dropped entirely from evaluate.json by
    build_dataset's selection-angle exclusion."""
    sel = tuple(CLINICAL_TEST_ANGLES[2])  # (90, 0), an existing test view
    phases = select_views(60, 120, numb_angles=4, selection_view=sel)
    tv = phases[0]["test_viewpoints"]
    assert tv.shape == (len(CLINICAL_TEST_ANGLES), 2)  # no growth
    np.testing.assert_array_equal(tv[0], sel)  # selection view first
    matches = np.all(tv == np.asarray(sel, float)[None, :], axis=1)
    assert matches.sum() == 1  # exactly one copy

    # disjoint selection views still prepend
    phases = select_views(60, 120, numb_angles=4, selection_view=(0, 0))
    assert phases[0]["test_viewpoints"].shape == (
        len(CLINICAL_TEST_ANGLES) + 1, 2
    )


def test_views_test_grid_override():
    phases = select_views(
        60, 120, numb_angles=4, limited_range_test=180, step_size_test=90
    )
    tv = phases[0]["test_viewpoints"]
    # grid 5x5 plus the prepended [0, -90]
    assert tv.shape == (26, 2)
    np.testing.assert_array_equal(tv[0], [0, -90])


def test_artifact_contract(built):
    args, paths = built
    assert os.path.isfile(paths.general)
    assert os.path.isfile(paths.train)
    assert os.path.isfile(paths.test)
    assert os.path.isfile(paths.evaluate)
    assert os.path.isfile(paths.srcmatrices)

    info = json.load(open(paths.general))
    for key in ("DSD", "DSO", "nDetector", "dDetector", "offDetector",
                "near_thresh", "far_thresh", "max_pixel_value"):
        assert key in info, key
    assert info["max_pixel_value"] == pytest.approx(np.log(8.670397))

    train = json.load(open(paths.train))["frames"]
    # 2 phases x 4 train views
    assert len(train) == 8
    frame = train[0]
    for key in ("image_id_str", "image_id", "file_path", "img_min_max",
                "weighted_file_path", "resp_phase", "heart_phase", "theta",
                "phi", "larm"):
        assert key in frame, key
    assert os.path.isfile(frame["file_path"])
    img = np.load(frame["file_path"])
    assert img.shape == (50, 50)
    assert img.min() == pytest.approx(0.0) and img.max() == pytest.approx(1.0)

    test = json.load(open(paths.test))["frames"]
    assert len(test) == 2 * len(CLINICAL_TEST_ANGLES)

    src = json.load(open(paths.srcmatrices))
    mat = np.asarray(next(iter(src.values())))
    assert mat.shape == (4, 4)


def test_denormalize_roundtrip(built):
    args, paths = built
    frame = json.load(open(paths.train))["frames"][0]
    img = denormalize_image(np.load(frame["file_path"]), 50, 50, frame["img_min_max"])
    mn, mx = frame["img_min_max"]
    assert img.min() == pytest.approx(mn, abs=1e-6)
    assert img.max() == pytest.approx(mx, abs=1e-6)


def test_loader_shapes_and_phases(built):
    args, paths = built
    data = load_dataset(paths, weighted_loss_max=1.0, use_weighting=False)
    n = 8 * 50 * 50
    assert data.rays.shape == (n, 4, 3)
    assert data.phases.shape == (n,)
    assert set(np.unique(data.phases)) == {0, 1}
    # single test frame rule (run_composite.py:74-76)
    assert len(data.test_frames) == 1
    # directions have sane magnitudes (unnormalized, ~1)
    norms = np.linalg.norm(data.rays[:, 1, :], axis=-1)
    assert 0.9 < norms.min() and norms.max() < 1.2


def test_loader_pixel_alignment(built):
    """Loaded pixel values must correspond ray-for-ray with a fresh
    projection through the stored geometry (self-consistency of the whole
    save->load->transpose chain)."""
    from nerfca_tpu.data.phantom import synthetic_phantom_volume
    from nerfca_tpu.ops.projector import project_view

    args, paths = built
    data = load_dataset(paths, use_weighting=False)
    frame = data.train_frames[0]
    vol = synthetic_phantom_volume(size=24, phase=frame["heart_phase"] / 10)
    integral = np.asarray(
        project_view(vol, data.info, frame["theta"], frame["phi"], n_samples=64)
    )
    expected_pixels = np.log(8.670397) - integral  # log-transmission
    got = data.rays[: 50 * 50, 2, 0].reshape(50, 50)
    np.testing.assert_allclose(got, expected_pixels, atol=1e-4)


def test_variance_maps_written_for_full_cycle(tmp_path):
    args = synth_args(
        tmp_path, data_time_range_start=0, data_time_range_end=10, synth_vol_size=16
    )
    paths = build_dataset(args, str(tmp_path / "data"), projector_samples=32)
    frames = json.load(open(paths.train))["frames"]
    wpath = frames[0]["weighted_file_path"]
    assert os.path.isfile(wpath)
    w = np.load(wpath)
    assert w.min() >= 1.0 and w.max() <= 2.0 + 1e-9
    # weights must peak where motion is (not constant)
    assert w.max() - w.min() > 0.5

    data = load_dataset(paths, weighted_loss_max=2.0)
    # rescale [1,2] -> [1, 3] (data_helpers.py:154-155)
    assert data.rays[:, 3, 0].max() <= 3.0 + 1e-6
    assert data.rays[:, 3, 0].min() >= 1.0 - 1e-6


def test_experiment_name_paths(tmp_path):
    args = synth_args(tmp_path, use_experiment_name=True, experiment_name="exp1")
    paths = dataset_paths(args, str(tmp_path / "data"))
    assert paths.train.endswith("train-exp1.json")
    args2 = synth_args(tmp_path)
    paths2 = dataset_paths(args2, str(tmp_path / "data"))
    assert paths2.train.endswith("train-60.0-120.0-0-2.json")


def test_vessel_only_volume_matches_composite_vessel():
    """The artery-only GT volume is exactly the composite's pasted vessel."""
    from nerfca_tpu.data.phantom import (
        synthetic_phantom_volume,
        synthetic_vessel_volume,
    )

    full = synthetic_phantom_volume(size=32, phase=0.3, smooth_sigma=0)
    dyn = synthetic_vessel_volume(size=32, phase=0.3, smooth_sigma=0)
    mask = dyn > 0
    assert mask.sum() > 0
    np.testing.assert_array_equal(full[mask], dyn[mask])
    # vessel is the brightest structure and it moves with phase
    assert dyn.max() == full.max()
    dyn2 = synthetic_vessel_volume(size=32, phase=0.8, smooth_sigma=0)
    assert (dyn2 > 0).sum() > 0 and ((dyn2 > 0) != mask).any()


def test_vessel_extent_keeps_vessel_in_every_frustum():
    """--synth_vessel_extent 0.22 puts the whole moving vessel inside
    every grid view's detector cone (round-3 FOV forensics: at extent 1.0
    the (60, -30) view sees NO vessel — max artery line integral 3e-4)."""
    import jax.numpy as jnp

    from nerfca_tpu.data.phantom import synthetic_vessel_volume
    from nerfca_tpu.geometry.cone import ConeGeometry, synth_geometry
    from nerfca_tpu.geometry.cone import get_near_far
    from nerfca_tpu.ops.projector import project_view

    geo = ConeGeometry.from_dict(synth_geometry(50, [48, 48, 48]))
    info = geo.to_info_dict()
    near, far = get_near_far(geo)
    info["near_thresh"], info["far_thresh"] = near, far

    swept = np.maximum.reduce([
        synthetic_vessel_volume(48, phase=ph / 10.0, vessel_extent=0.22)
        for ph in range(0, 10, 3)
    ])
    views = [(-30.0, 30.0), (-30.0, -30.0), (60.0, -30.0), (60.0, 30.0),
             (90.0, 0.0)]
    for theta, phi in views:
        img = np.asarray(
            project_view(jnp.asarray(swept), info, theta, phi, n_samples=200)
        )
        assert img.max() > 0.02, (theta, phi, float(img.max()))
    # the extent-1.0 pathology this knob fixes: (60, -30) sees nothing
    swept_full = np.maximum.reduce([
        synthetic_vessel_volume(48, phase=ph / 10.0, vessel_extent=1.0)
        for ph in range(0, 10, 3)
    ])
    img = np.asarray(
        project_view(jnp.asarray(swept_full), info, 60.0, -30.0,
                     n_samples=200)
    )
    assert img.max() < 0.01, float(img.max())


def test_dyn_ground_truth_written_for_test_views(built):
    """SYNTH test frames get artery-only line-integral artifacts."""
    args, paths = built
    frames = json.load(open(paths.test))["frames"]
    dyn_path = frames[0]["file_path"].replace(".npy", "-dyn.npy")
    assert os.path.isfile(dyn_path)
    li = np.load(dyn_path)
    assert li.shape == (50, 50)
    assert np.isfinite(li).all() and li.max() > 0
    # train frames have no dyn artifacts (eval-only ground truth)
    tf = json.load(open(paths.train))["frames"]
    assert not os.path.isfile(tf[0]["file_path"].replace(".npy", "-dyn.npy"))


def test_prepare_data_cli_writes_mip_and_geometry_png(tmp_path):
    """--only_prepare_data writes MIP ground truth for test views and
    --visualize_geometry writes the acquisition scene plot, both during
    dataset generation (reference datatoray.py:65-92,127-141)."""
    from nerfca_tpu.train.run_composite import main

    main([
        "--platform", "cpu",
        "--data_name", "SYNTH",
        "--data_size", "50",
        "--synth_vol_size", "16",
        "--data_numb_angles", "4",
        "--data_time_range_start", "0",
        "--data_time_range_end", "1",
        "--only_prepare_data", "true",
        "--visualize_geometry", "true",
        "--data_root", str(tmp_path / "data"),
        "--log_dir_root", str(tmp_path / "cases"),
    ])
    folder = str(tmp_path / "data" / "SYNTH" / "50")
    names = os.listdir(folder)
    mips = [n for n in names if n.endswith("-mip.npy")]
    assert len(mips) == 4  # one per clinical test view
    mip = np.load(os.path.join(folder, mips[0]))
    assert mip.shape == (50, 50) and np.isfinite(mip).all() and mip.max() > 0
    assert "geometry.png" in names


def test_selection_view_protocol(tmp_path):
    """--selection_view 'theta,phi' puts a dedicated model-selection view
    FIRST in test-*.json (the checkpoint-best view) and EXCLUDES it from
    evaluate.json, so the reported held-out mean is disjoint from model
    selection (VERDICT r2 item 4)."""
    args = synth_args(tmp_path, selection_view="15,0")
    paths = build_dataset(args, str(tmp_path / "data"), projector_samples=32)

    with open(paths.test) as f:
        test_frames = json.load(f)["frames"]
    with open(paths.evaluate) as f:
        eval_frames = json.load(f)["frames"]

    # selection view leads the test list (trainer takes test_frames[0])
    assert (test_frames[0]["theta"], test_frames[0]["phi"]) == (15.0, 0.0)
    # ... and never appears in the reported evaluation set
    assert all(
        (f["theta"], f["phi"]) != (15.0, 0.0) for f in eval_frames
    )
    # the clinical views are still all there (2 phases x 4 views)
    assert len(eval_frames) == 8
    assert len(test_frames) == 10


def test_multi_selection_view_protocol(tmp_path):
    """';'-separated --selection_view pairs all lead test-*.json (in listed
    order) and are ALL excluded from evaluate.json; the dataset tag encodes
    every pair so folders with different selection sets never alias
    (VERDICT r4 item 5: multi-view model selection)."""
    args = synth_args(tmp_path, selection_view="15,0;0,20")
    paths = build_dataset(args, str(tmp_path / "data"), projector_samples=32)

    with open(paths.test) as f:
        test_frames = json.load(f)["frames"]
    with open(paths.evaluate) as f:
        eval_frames = json.load(f)["frames"]

    assert (test_frames[0]["theta"], test_frames[0]["phi"]) == (15.0, 0.0)
    assert (test_frames[1]["theta"], test_frames[1]["phi"]) == (0.0, 20.0)
    for pair in ((15.0, 0.0), (0.0, 20.0)):
        assert all((f["theta"], f["phi"]) != pair for f in eval_frames)
    # clinical views intact (2 phases x 4 views); test adds 2 selection
    # views per phase
    assert len(eval_frames) == 8
    assert len(test_frames) == 12

    # distinct identity vs the single-view build
    single = synth_args(tmp_path, selection_view="15,0")
    assert dataset_paths(single, str(tmp_path / "data")).train != paths.train


def test_selection_view_is_dataset_identity(tmp_path):
    """A folder built WITHOUT --selection_view must not satisfy a run that
    asks for one: the selection view is part of the dataset tag (distinct
    train/test json names -> prepare re-builds) and a re-build REWRITES
    evaluate.json so the new selection view never lingers in the reported
    set (code-review r3 finding: stale-folder eval-selection leak)."""
    plain = synth_args(tmp_path)
    paths_plain = build_dataset(plain, str(tmp_path / "data"),
                                projector_samples=32)

    sel = synth_args(tmp_path, selection_view="15,0")
    paths_sel = dataset_paths(sel, str(tmp_path / "data"))
    # different artifact identity: the existence check cannot be satisfied
    # by the plain build
    assert paths_sel.train != paths_plain.train
    assert paths_sel.test != paths_plain.test
    assert not os.path.isfile(paths_sel.train)

    # the plain build already wrote evaluate.json; the selection build
    # must overwrite it with the selection view excluded
    assert os.path.isfile(paths_plain.evaluate)
    paths_sel = build_dataset(sel, str(tmp_path / "data"),
                              projector_samples=32)
    with open(paths_sel.evaluate) as f:
        eval_frames = json.load(f)["frames"]
    assert all((f["theta"], f["phi"]) != (15.0, 0.0) for f in eval_frames)
    with open(paths_sel.test) as f:
        test_frames = json.load(f)["frames"]
    assert (test_frames[0]["theta"], test_frames[0]["phi"]) == (15.0, 0.0)


def test_experiment_json_view_list(tmp_path):
    """use_experiment_name loads the curated per-phase view/phase json
    (general_helpers.py:70-78) instead of the grid/preset selection."""
    exp_dir = tmp_path / "data" / "SYNTH" / "experiments"
    os.makedirs(exp_dir)
    experiment = [
        {
            "hrt_phase": 0.0,
            "resp_phase": 0,
            "train_viewpoints": [[-20, 10], [35, -5]],
            "test_viewpoints": [[0, 45]],
        },
        {
            "hrt_phase": 0.5,
            "train_viewpoints": [[-20, 10]],
        },
    ]
    with open(exp_dir / "curated.json", "w") as f:
        json.dump(experiment, f)

    args = synth_args(
        tmp_path, use_experiment_name=True, experiment_name="curated"
    )
    paths = build_dataset(args, str(tmp_path / "data"), projector_samples=32)
    # file naming keys on the experiment name
    assert "curated" in os.path.basename(paths.train)

    with open(paths.train) as f:
        train_frames = json.load(f)["frames"]
    with open(paths.test) as f:
        test_frames = json.load(f)["frames"]

    # the curated lists drive the rendered views: 2+1 train frames, 1 test
    assert len(train_frames) == 3
    assert len(test_frames) == 1
    assert {(f["theta"], f["phi"]) for f in train_frames} == {
        (-20.0, 10.0), (35.0, -5.0)
    }
    assert (test_frames[0]["theta"], test_frames[0]["phi"]) == (0.0, 45.0)
    # phases follow the curated hrt_phase entries (0.0 and 0.5 -> hrt 0, 5)
    assert {f["heart_phase"] for f in train_frames} == {0, 5}
