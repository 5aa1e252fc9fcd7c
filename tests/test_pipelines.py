"""XCAT / CCTA pipeline and volume-IO tests (no external binaries: the
processing math is exercised on synthetic arrays)."""

import json
import os

import numpy as np
import pytest

from nerfca_tpu.data.ccta import (
    condition_vessel,
    hounsfield_to_attenuation,
    preprocess_ccta_volume,
)
from nerfca_tpu.data.volume_io import load_volume, normalize, read_vtk, save_vtk
from nerfca_tpu.data.xcat import (
    extract_artery_volume,
    extract_lca,
    find_phase_id,
    lca_bounding_box_center,
    load_xcat_bin,
    override_param_file,
)


def test_hounsfield_to_attenuation():
    # water = 0 HU -> mu_water; air = -1000 HU -> mu_air
    mu_w, mu_a = 0.1494 * 2.5e-2, 0.0430 * 2.5e-2
    np.testing.assert_allclose(hounsfield_to_attenuation(np.array([0.0])), mu_w)
    np.testing.assert_allclose(
        hounsfield_to_attenuation(np.array([-1000.0])), mu_a, rtol=1e-6
    )


def test_condition_vessel_profile():
    """The conditioned vessel must peak at the centerline and taper."""
    raw = np.full((24, 24, 24), 0.01, np.float32)
    mask = np.zeros_like(raw)
    mask[10:14, 10:14, 4:20] = 1  # a thick tube along z
    vessel, cond = condition_vessel(raw, mask, contrast_f=0.05)
    inner = vessel[11, 11, 12]
    outer = vessel[10, 10, 12]
    assert inner > outer >= 0
    assert vessel.max() <= 0.05 + 1e-6


def test_preprocess_ccta_volume_end_to_end():
    rng = np.random.default_rng(0)
    raw = rng.normal(50, 10, (20, 20, 20))  # HU-ish
    lca = np.zeros((20, 20, 20))
    lca[8:12, 8:12, 5:15] = 1
    total = np.zeros((20, 20, 20), int)
    total[2:6, 2:6, 2:6] = 51  # heart
    total[14:18, 14:18, 2:6] = 52  # aorta
    out = preprocess_ccta_volume(raw, lca, total, spacing=(1, 1, 1))
    assert out.shape == (20, 20, 20)
    assert out.dtype == np.float32
    # aorta flattened to heart mean attenuation
    heart_mean = hounsfield_to_attenuation(raw)[total == 51].mean()
    np.testing.assert_allclose(out[15, 15, 3], heart_mean, rtol=1e-4)


def test_xcat_bin_roundtrip(tmp_path):
    vol = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "v_atn_1.bin"
    vol.tofile(path)
    loaded = load_xcat_bin(str(path), (2, 3, 4))
    np.testing.assert_array_equal(loaded, vol)


def test_override_param_file(tmp_path):
    src = tmp_path / "volume.samp.par"
    src.write_text(
        "0.0\thrt_start_phase_index (between 0 and 1)\n"
        "0.0\tresp_start_phase_index (between 0 and 1)\n"
        "other\tline\n"
    )
    dst = tmp_path / "out.par"
    override_param_file(
        str(src), str(dst),
        {"hrt_start_phase_index": 0.3, "resp_start_phase_index": 0.0},
    )
    lines = dst.read_text().splitlines()
    assert lines[0].startswith("0.3\t")
    assert "hrt_start_phase_index" in lines[0]
    assert lines[2] == "other\tline"
    with pytest.raises(KeyError):
        override_param_file(str(src), str(dst), {"missing_key": 1})


def test_extract_lca_bounds_and_pinning():
    full = np.full((30, 30, 30), 0.05, np.float32)
    no_art = full.copy()
    # artery voxels: one inside the LCA bounds region, one outside
    full[5, 28, 5] += 0.1   # y=28 -> inside [250,500]-scaled? bounds are in
    full[5, 2, 5] += 0.1    # y=2 -> outside the y window
    artery = extract_artery_volume(full, no_art)
    # scale bounds to this grid: default bounds assume 512-ish grids, so
    # pass explicit bounds matching the 30-grid
    bounds = np.array([[0, 20], [25, 30], [0, 20]])
    pinned, lca = extract_lca(full, artery, lca_val=0.7, bounds=bounds)
    assert pinned[5, 28, 5] == pytest.approx(0.7)
    assert pinned[5, 2, 5] == pytest.approx(0.15)  # untouched
    assert (lca > 0).sum() == 1


def test_lca_bounding_box_center():
    vol = np.zeros((10, 10, 10))
    vol[2, 3, 4] = 1
    vol[6, 5, 8] = 1
    np.testing.assert_allclose(lca_bounding_box_center(vol), [4.0, 4.0, 6.0])
    assert lca_bounding_box_center(np.zeros((4, 4, 4))) == [0.0, 0.0, 0.0]


def test_find_phase_id():
    lst = [{"id": 0, "hrt_phase": 0.3, "resp_phase": 0.0}]
    obj, idx = find_phase_id(lst, 0.3, 0.0)
    assert idx == 0 and obj["id"] == 0
    obj, idx = find_phase_id(lst, 0.5, 0.0)
    assert idx == 1 and obj == {}


def test_vtk_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    vol = rng.uniform(size=(5, 6, 7)).astype(np.float32)
    path = str(tmp_path / "v.vtk")
    save_vtk(path, vol, spacing=(0.5, 0.5, 0.5), origin=(1, 2, 3))
    back, meta = read_vtk(path)
    np.testing.assert_allclose(back, vol, atol=1e-7)
    assert meta["dimensions"] == [5, 6, 7]
    assert meta["spacing"] == [0.5, 0.5, 0.5]


def test_load_volume_flattened(tmp_path):
    vol = np.arange(24, dtype=np.float32)
    np.save(tmp_path / "v.npy", vol)
    out = load_volume("v.npy", (2, 3, 4), str(tmp_path))
    assert out.shape == (2, 3, 4)


def test_normalize():
    norm, lo, hi = normalize(np.array([2.0, 4.0]))
    np.testing.assert_allclose(norm, [0, 1])
    assert (lo, hi) == (2.0, 4.0)
    z, _, _ = normalize(np.full(3, 5.0))
    np.testing.assert_allclose(z, 0)


def test_ccta_surrogate_exercises_full_pipeline(tmp_path):
    """The HU-space surrogate drives every array-level step of the CCTA
    pipeline (HU->mu, resample-by-spacing, aorta flattening, EDT vessel
    conditioning) and writes the dataset builder's volume contract
    (VERDICT r3 item 6 groundwork)."""
    import numpy as np

    from nerfca_tpu.data.ccta import hounsfield_to_attenuation
    from nerfca_tpu.data.ccta_surrogate import (
        surrogate_ccta_arrays,
        write_surrogate_case,
    )

    shape, spacing = (72, 72, 48), (3.6, 3.6, 6.0)
    raw, lca, seg = surrogate_ccta_arrays(0.3, shape=shape, spacing=spacing)
    assert raw.dtype == np.float32 and raw.shape == shape
    assert raw.min() <= -900 and 300 <= raw.max() <= 1100  # HU-scaled
    assert lca.sum() > 0
    assert (seg == 51).sum() > 0 and (seg == 52).sum() > 0  # heart, aorta
    assert ((seg >= 79) & (seg < 118)).sum() > 0  # ribs
    # contrast-filled aorta brighter than heart BEFORE flattening
    mu = hounsfield_to_attenuation(raw)
    assert mu[seg == 52].mean() > mu[seg == 51].mean()

    # the moving vessel is the ONLY phase-dependent structure by default
    raw2, lca2, _ = surrogate_ccta_arrays(0.6, shape=shape, spacing=spacing)
    union = (lca | lca2) > 0
    np.testing.assert_array_equal(
        np.where(union, 0, raw), np.where(union, 0, raw2)
    )
    assert (lca2 != lca).any()  # and it does move

    # full contract write for two phases
    write_surrogate_case(
        str(tmp_path), phases=2, shape=shape, spacing=spacing, verbose=False
    )
    for p in (0, 1):
        full = np.load(tmp_path / str(p) / "full_volume_tigre.npy")
        dyn = np.load(tmp_path / str(p) / "dyn_volume_tigre.npy")
        assert full.shape == dyn.shape
        # resample by spacing actually changed the grid
        assert full.shape != shape
        assert (dyn > 0).sum() > 0
        # the conditioned vessel is the brightest structure (clinical
        # contrast), and dyn is exactly its appearance in the composite
        assert np.isclose(float(dyn.max()), float(full.max()))
        nz = dyn > 0
        np.testing.assert_allclose(full[nz], dyn[nz])
        # reference artifact names too (preprocess_ccta.py:127-147)
        assert (tmp_path / str(p) / "full_volume.npy").exists()
        assert (tmp_path / str(p) / "volume-shape.npy").exists()
        assert (tmp_path / str(p) / "spacing.npy").exists()


def test_xcat_surrogate_drives_full_driver_contract(tmp_path, monkeypatch):
    """The surrogate dxcat1_bin executes EVERY stage of the real XCAT
    driver (param override -> subprocess -> bin load -> |full-noarteries|
    -> LCA crop+pin 0.15 -> registry) at reduced dims, producing a moving
    pinned-LCA volume inside the (scaled) reference crop box."""
    import os
    import shutil

    import numpy as np

    from nerfca_tpu.data.xcat import prepare_and_run_xcat

    xp = str(tmp_path)
    shutil.copy("scripts/dxcat_surrogate_bin.py", os.path.join(xp, "dxcat1_bin"))
    os.chmod(os.path.join(xp, "dxcat1_bin"), 0o755)
    par = ("0.0\thrt_start_phase_index (cardiac phase)\n"
           "0.0\tresp_start_phase_index (resp phase)\n")
    for name in ("volume", "noarteries"):
        with open(os.path.join(xp, f"{name}.samp.par"), "w") as f:
            f.write(par)
    monkeypatch.setenv("XCAT_SURR_DIMS", "48,48,38")
    monkeypatch.setenv("XCAT_SURR_DVOXEL", "2.7")
    monkeypatch.setenv("NERFCA_REPO", os.getcwd())

    lcas = []
    for p in (0.0, 0.5):
        obj = prepare_and_run_xcat(p, 0.0, xp, dimensions=(48, 48, 38))
        run = os.path.join(xp, str(obj["id"]))
        lca = np.load(os.path.join(run, "dyn_volume_tigre.npy"))
        full = np.load(os.path.join(run, "full_volume_tigre.npy"))
        assert (lca > 0).sum() > 0
        assert np.isclose(float(lca.max()), 0.15, atol=1e-6)  # pinned
        nz = lca > 0
        np.testing.assert_allclose(full[nz], lca[nz])  # pin visible in full
        assert os.path.isfile(os.path.join(run, "full_volume.npy"))
        lcas.append(lca)
    # the coronary moves between phases; the registry has both entries
    assert (((lcas[0] > 0) ^ (lcas[1] > 0)).sum()) > 0
    import json

    reg = json.load(open(os.path.join(xp, "phases.json")))
    assert len(reg) == 2 and reg[1]["hrt_phase"] == 0.5
