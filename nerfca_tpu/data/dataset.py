"""Dataset builder — the ``datatoray`` equivalent.

Given 4-D phantom volumes (one per cardiac phase), project every train/test
viewpoint with the JAX cone-beam projector and write the reference's artifact
contract to ``data/<name>/<size>/``:

  - ``general.json``: scaled geometry + near/far + log max_pixel_value
    (``preprocess/tigre_helpers.py:65-80``)
  - per-view ``image-hrt=<p>-resp=<r>-angles=<t>-<f>.npy`` (min-max
    normalized log-transmission) and ``.png``
    (``preprocess/tigre_helpers.py:106-138``)
  - ``train-*.json`` / ``test-*.json`` / ``evaluate.json`` frame lists with
    image ids, min/max, variance-map paths, phases, angles
    (``preprocess/tigre_helpers.py:208-223``, ``preprocess/datatoray.py:149-157``)
  - per-viewpoint temporal variance maps ``image-<t>-<f>-var.npy``/``.png``
    (weights in [1, 2]) once all 10 phases are processed
    (``preprocess/general_helpers.py:17-44``, ``datatoray.py:160-161``)
  - ``srcmatrices.json`` with the per-view 4x4 poses (``datatoray.py:163-164``)
  - optional MIP ground-truth renders for test views (``datatoray.py:127-141``)

Volumes come from (in order of preference): a user-supplied
``volume_provider`` callable, ``<volume_root>/<phase>/full_volume_tigre.npy``
on disk (the XCAT/CCTA pipeline output contract), or the built-in synthetic
phantom for the ``SYNTH`` data family.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable, Optional

import numpy as np

from nerfca_tpu.geometry.cone import (
    MAX_PIXEL_VALUE,
    SCALE_FACTOR,
    ConeGeometry,
    ccta_geometry,
    get_near_far,
    synth_geometry,
    xcat_geometry,
)
from nerfca_tpu.geometry.rays import pose_matrix
from nerfca_tpu.data.phantom import (
    synthetic_phantom_volume,
    synthetic_vessel_volume,
)
from nerfca_tpu.data.views import select_views
from nerfca_tpu.ops.projector import project_view, transmission_image


@dataclasses.dataclass
class DatasetPaths:
    folder: str
    general: str
    train: str
    test: str
    evaluate: str
    srcmatrices: str


def _experiment_tag(args) -> str:
    if getattr(args, "use_experiment_name", False) and getattr(
        args, "experiment_name", None
    ):
        return args.experiment_name
    tag = (
        f"{float(args.data_limited_range)}-{float(args.data_step_size)}"
        f"-{args.data_time_range_start}-{args.data_time_range_end}"
    )
    # the selection view is part of the dataset's IDENTITY: it reorders
    # test-*.json (selection view first — the in-loop/checkpoint-best
    # metric keys on frame 0) and excludes itself from evaluate.json.
    # Without it in the tag, a folder built without --selection_view
    # satisfies the existence check in prepare_composite and the run
    # silently selects checkpoints on a view INSIDE the reported eval set.
    sel = _parse_selection_views(getattr(args, "selection_view", None))
    if sel is not None:
        for t, p in sel:  # single-view tags match the pre-multi-view format
            tag += f"-sel{t:g}-{p:g}"
    return tag


def dataset_paths(args, root: str = "data") -> DatasetPaths:
    folder = os.path.join(root, str(args.data_name), str(args.data_size))
    tag = _experiment_tag(args)
    return DatasetPaths(
        folder=folder,
        general=os.path.join(folder, "general.json"),
        train=os.path.join(folder, f"train-{tag}.json"),
        test=os.path.join(folder, f"test-{tag}.json"),
        evaluate=os.path.join(folder, "evaluate.json"),
        srcmatrices=os.path.join(folder, "srcmatrices.json"),
    )


def _geometry_for(args, vol_dimensions) -> dict:
    name = str(args.data_name)
    if name.startswith("SYNTH"):
        return synth_geometry(int(args.data_size), list(vol_dimensions))
    if name.startswith("XCAT"):
        return xcat_geometry(int(args.data_size), list(vol_dimensions))
    if name.startswith("MAGIX") or name.startswith("CCTA"):
        return ccta_geometry(int(args.data_size), list(vol_dimensions))
    raise ValueError(f"unknown data_name family: {name!r}")


def _phantom_kwargs(args, vessel: bool = False) -> dict:
    """Synthetic-phantom shape knobs shared by the composite and the
    vessel-only GT providers. Engineering the operating point (vessel
    contrast / size / motion amplitude, background rib softness and
    smoothing) is a SYNTH-family superset; use a distinct ``data_name``
    (e.g. ``SYNTH-HC``) so variants get their own dataset folder."""
    kw = {
        "lca_val": float(getattr(args, "synth_lca_val", 1.2)),
        "vessel_radius": float(getattr(args, "synth_vessel_radius", 0.045)),
        "motion_scale": float(getattr(args, "synth_motion_scale", 1.0)),
        "smooth_sigma": float(getattr(args, "synth_smooth_sigma", 1.0)),
        "vessel_extent": float(getattr(args, "synth_vessel_extent", 1.0)),
    }
    if not vessel:  # background-only knobs
        kw["rib_scale"] = float(getattr(args, "synth_rib_scale", 1.0))
    return kw


def _default_volume_provider(args) -> Callable[[int], np.ndarray]:
    """Resolve volumes per integer phase: disk artifacts, else synthetic."""
    root = getattr(args, "volume_root", None)

    def provider(int_phase: int) -> np.ndarray:
        if root:
            path = os.path.join(root, str(int_phase), "full_volume_tigre.npy")
            if os.path.isfile(path):
                return np.load(path)
        if str(args.data_name).startswith("SYNTH"):
            size = int(getattr(args, "synth_vol_size", 64))
            return synthetic_phantom_volume(
                size=size, phase=int_phase / 10, **_phantom_kwargs(args)
            )
        raise FileNotFoundError(
            f"no volume for phase {int_phase}: set volume_root to a directory "
            f"with <phase>/full_volume_tigre.npy or use the SYNTH data family"
        )

    return provider


def _default_dynamic_provider(args) -> Callable[[int], Optional[np.ndarray]]:
    """Resolve the DYNAMIC-component (artery-only) volume per phase.

    Disk contract: ``<volume_root>/<phase>/dyn_volume_tigre.npy`` — for XCAT
    this is the artery volume ``|full - noarteries|`` the reference pipeline
    already extracts (``preprocess/xcat.py:115-117``). The SYNTH family
    falls back to the built-in vessel-only phantom. Returns None when no
    ground-truth dynamic component exists (real CCTA scans)."""
    root = getattr(args, "volume_root", None)

    def provider(int_phase: int) -> Optional[np.ndarray]:
        if root:
            path = os.path.join(root, str(int_phase), "dyn_volume_tigre.npy")
            if os.path.isfile(path):
                return np.load(path)
        if str(args.data_name).startswith("SYNTH"):
            size = int(getattr(args, "synth_vol_size", 64))
            return synthetic_vessel_volume(
                size=size, phase=int_phase / 10,
                **_phantom_kwargs(args, vessel=True),
            )
        return None

    return provider


def _save_png(path: str, img: np.ndarray, cmap: str = "gray") -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, img, cmap=cmap)
    except Exception:
        pass  # PNGs are a debugging convenience, never load-bearing


def _store_frame(
    image_id: int,
    image_id_str: str,
    img_min: float,
    img_max: float,
    view_key: str,
    resp_phase: float,
    int_hrt_phase: int,
    hrt_phase: float,
    theta: float,
    phi: float,
    larm: float,
    folder: str,
) -> dict:
    """Frame metadata record (``preprocess/tigre_helpers.py:208-223``)."""
    return {
        "image_id_str": image_id_str,
        "image_id": image_id,
        "file_path": os.path.join(folder, f"{image_id_str}.npy"),
        "img_min_max": [float(img_min), float(img_max)],
        "weighted_file_path": os.path.join(folder, f"image-{view_key}-var.npy"),
        "resp_phase": resp_phase,
        "heart_phase": int_hrt_phase,
        "org_heart_phase": int(hrt_phase),
        "theta": float(theta),
        "phi": float(phi),
        "larm": float(larm),
    }


def _parse_selection_views(spec) -> Optional[tuple]:
    """'t,p' or 't1,p1;t2,p2;...' -> ((t, p), ...); None/empty -> None.

    Multi-view model selection (2-3 disjoint selection views, mean metric)
    exists because single-view selection provably disagrees with the
    40-view held-out metric at sparse-view operating points (round-4
    clean-protocol data: 18.0 dB selected vs 20.1 dB oracle at 4-view, and
    an inverted pick at 3-view)."""
    if spec is None or (isinstance(spec, str) and not spec.strip()):
        return None
    if isinstance(spec, (tuple, list)):
        pairs = [spec] if not isinstance(spec[0], (tuple, list)) else list(spec)
    else:
        pairs = [s.split(",") for s in str(spec).split(";") if s.strip()]
    return tuple((float(t), float(p)) for t, p in pairs) or None


def build_dataset(
    args,
    root: str = "data",
    volume_provider: Optional[Callable[[int], np.ndarray]] = None,
    projector_samples: int = 1000,
    write_mip: bool = False,
    dynamic_volume_provider: Optional[
        Callable[[int], Optional[np.ndarray]]
    ] = None,
) -> DatasetPaths:
    """Generate the full on-disk dataset. Returns the artifact paths.

    ``args`` carries the config surface fields (``data_name``, ``data_size``,
    ``data_limited_range``, ``data_step_size``, ``data_numb_angles``,
    ``data_time_range_start/end``, optional test-grid overrides).
    """
    paths = dataset_paths(args, root)
    os.makedirs(paths.folder, exist_ok=True)

    provider = volume_provider or _default_volume_provider(args)
    dyn_provider = dynamic_volume_provider or _default_dynamic_provider(args)

    # probe one volume for dimensions
    first_phase = int(args.data_time_range_start)
    vol0 = np.asarray(provider(first_phase), dtype=np.float32)
    geo_data = _geometry_for(args, vol0.shape)
    geo = ConeGeometry.from_dict(geo_data, SCALE_FACTOR)
    near, far = get_near_far(geo)

    # general.json: scaled geometry + thresholds (tigre_helpers.py:65-80)
    info = geo.to_info_dict()
    info["near_thresh"] = near
    info["far_thresh"] = far
    info["max_pixel_value"] = float(np.log(MAX_PIXEL_VALUE))
    with open(paths.general, "w") as fp:
        json.dump(info, fp)

    if getattr(args, "use_experiment_name", False):
        # curated experiment list: the json IS the per-phase view/phase list
        # (general_helpers.py:70-78; the reference reads it from
        # preprocess/xcat/<name>.json — here it may sit next to the dataset
        # or under configs/experiments/)
        from nerfca_tpu.data.views import load_experiment_views

        candidates = [
            os.path.join(root, args.data_name, "experiments",
                         f"{args.experiment_name}.json"),
            os.path.join("configs", "experiments",
                         f"{args.experiment_name}.json"),
        ]
        for cand in candidates:
            if os.path.isfile(cand):
                phase_list = load_experiment_views(cand)
                break
        else:
            raise FileNotFoundError(
                f"use_experiment_name set but no experiment json found at "
                f"{candidates}"
            )
    else:
        phase_list = select_views(
            limited_range=float(args.data_limited_range),
            step_size=float(args.data_step_size),
            numb_angles=getattr(args, "data_numb_angles", None),
            time_range_start=int(args.data_time_range_start),
            time_range_end=int(args.data_time_range_end),
            limited_range_test=getattr(args, "data_limited_range_test", None),
            step_size_test=getattr(args, "data_step_size_test", None),
            selection_view=_parse_selection_views(
                getattr(args, "selection_view", None)
            ),
        )

    # --visualize_geometry: scene plot of the first phase's acquisition
    # (reference renders it during dataset generation, datatoray.py:91-92)
    if getattr(args, "visualize_geometry", False) and phase_list:
        from nerfca_tpu.utils.visualize import visualize_geometry

        half = 0.5 * np.asarray(info["nVoxel"]) * np.asarray(info["dVoxel"])
        off = np.asarray(info["offOrigin"])
        bounds = np.stack([off - half, off + half], axis=-1)
        visualize_geometry(
            phase_list[0]["train_viewpoints"],
            info,
            volume_bounds=bounds,
            save_path=os.path.join(paths.folder, "geometry.png"),
        )

    # the reference writes MIP ground-truth renders for test views during a
    # pure data-preparation pass (datatoray.py:127-141)
    write_mip = write_mip or bool(getattr(args, "only_prepare_data", False))

    train_frames: list[dict] = []
    test_frames: list[dict] = []
    src_matrices: dict[str, list] = {}
    # per-viewpoint stacks of absorption images across phases (variance maps)
    per_view_integrals: dict[str, list[np.ndarray]] = {}

    image_id = 0
    for phase_obj in phase_list:
        hrt_phase = phase_obj["hrt_phase"]
        int_hrt = int(round(hrt_phase * 10))
        resp = phase_obj["resp_phase"]
        volume = (
            vol0
            if int_hrt == first_phase
            else np.asarray(provider(int_hrt), dtype=np.float32)
        )

        def process_view(theta, phi, frames):
            nonlocal image_id
            view_key = f"{theta}-{phi}"
            image_id_str = (
                f"image-hrt={int_hrt}-resp={int(resp)}-angles={view_key}"
            )
            line_integral = np.asarray(
                project_view(
                    volume, info, float(theta), float(phi), 0.0,
                    n_samples=projector_samples,
                )
            )
            norm_img, img_min, img_max = transmission_image(
                line_integral, MAX_PIXEL_VALUE
            )
            # saved transposed so the loader's reshape(W,H).T round-trips to
            # the ray layout (see data_helpers.py:131 and loader.py)
            np.save(os.path.join(paths.folder, f"{image_id_str}.npy"), norm_img.T)
            _save_png(
                os.path.join(paths.folder, f"{image_id_str}.png"), norm_img
            )
            per_view_integrals.setdefault(view_key, []).append(line_integral)
            src_matrices[view_key] = pose_matrix(
                float(theta), float(phi), 0.0, geo.DSO
            ).tolist()
            frames.append(
                _store_frame(
                    image_id, image_id_str, img_min, img_max, view_key,
                    resp, int_hrt, hrt_phase * 10, theta, phi, 0.0, paths.folder,
                )
            )
            image_id += 1
            return image_id_str

        for theta, phi in np.asarray(phase_obj["train_viewpoints"]):
            process_view(theta, phi, train_frames)

        dyn_volume: Optional[np.ndarray] = None
        dyn_checked = False
        for theta, phi in np.asarray(phase_obj["test_viewpoints"]):
            image_id_str = process_view(theta, phi, test_frames)
            if not dyn_checked:
                dyn_checked = True
                dv = dyn_provider(int_hrt)
                dyn_volume = (
                    np.asarray(dv, dtype=np.float32) if dv is not None else None
                )
            if dyn_volume is not None:
                # dynamic-component ground truth: raw line integral of the
                # artery-only volume (eval compares the temporal field's
                # attenuation integral against this)
                dyn_li = np.asarray(
                    project_view(
                        dyn_volume, info, float(theta), float(phi), 0.0,
                        n_samples=projector_samples,
                    )
                )
                np.save(
                    os.path.join(paths.folder, f"{image_id_str}-dyn.npy"),
                    dyn_li.T,
                )
                _save_png(
                    os.path.join(paths.folder, f"{image_id_str}-dyn.png"),
                    dyn_li,
                )
            if write_mip:
                mip = np.asarray(
                    project_view(
                        volume, info, float(theta), float(phi), 0.0,
                        n_samples=projector_samples, mode="mip",
                    )
                )
                np.save(
                    os.path.join(paths.folder, f"{image_id_str}-mip.npy"), mip
                )
                _save_png(
                    os.path.join(paths.folder, f"{image_id_str}-mip.png"), mip
                )

    with open(paths.train, "w") as fp:
        json.dump({"frames": train_frames}, fp)
    with open(paths.test, "w") as fp:
        json.dump({"frames": test_frames}, fp)
    # evaluate.json excludes the dedicated selection view (if any): the
    # trainer's checkpoint-best retention keys on the FIRST test frame, so
    # the reported held-out mean must not contain it. ALWAYS rewritten by a
    # build — it is derived from the same test_frames, and preserving a
    # pre-existing file can leave a newly-added selection view inside the
    # reported set (the eval-selection leak the protocol exists to close).
    sel = _parse_selection_views(getattr(args, "selection_view", None))
    eval_frames = test_frames
    if sel is not None:
        excluded = set(sel)
        eval_frames = [
            f for f in test_frames
            if (float(f["theta"]), float(f["phi"])) not in excluded
        ]
    with open(paths.evaluate, "w") as fp:
        json.dump({"frames": eval_frames}, fp)
    with open(paths.srcmatrices, "w") as fp:
        json.dump(src_matrices, fp)

    # variance weight maps only when the full cardiac cycle was processed
    # (datatoray.py:160-161)
    if int(args.data_time_range_end) - int(args.data_time_range_start) == 10:
        write_variance_maps(per_view_integrals, paths.folder)

    return paths


def write_variance_maps(
    per_view_integrals: dict[str, list[np.ndarray]], folder: str
) -> None:
    """Per-viewpoint temporal variance of the absorption images, min-max
    normalized and shifted to weights in [1, 2]
    (``preprocess/general_helpers.py:17-44``)."""
    for view_key, integrals in per_view_integrals.items():
        stack = np.stack(integrals, axis=0)
        var_pix = np.ones(stack.shape[1:], dtype=np.float64)
        if stack.shape[0] > 1:
            absorption = np.exp(-stack.reshape(stack.shape[0], -1))
            var = np.var(absorption, axis=0).reshape(stack.shape[1:])
            vmin, vmax = var.min(), var.max()
            var_pix = (var - vmin) / (vmax - vmin + 1e-10)
        _save_png(
            os.path.join(folder, f"image-{view_key}-var.png"), var_pix, cmap="Reds"
        )
        # stored transposed like the images, so the loader transpose aligns
        # weights with rays
        np.save(
            os.path.join(folder, f"image-{view_key}-var.npy"), (var_pix + 1).T
        )
