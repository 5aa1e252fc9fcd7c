"""Dataset loading: json/npy artifacts -> flat ray arrays for training.

Reference parity: ``train/data_helpers.py:129-165``
(``prepare_data_for_loader_tigre`` + ``denormalize_image``):

  - per-frame ray generation from the stored angles;
  - image denormalization via the stored (min, max), with the load-time
    transpose that aligns stored images with the ray layout
    (``data_helpers.py:131``);
  - variance weights rescaled from [1, 2] to [1, weighted_loss_max + 1]
    (``data_helpers.py:154-155``);
  - one flat array ``[N_img*W*H, 4, 3]`` with rows (origin, direction,
    pixel, weight) plus the flat integer phase array.

TPU note: the output arrays are built once on host and then live in device
HBM for the whole run; the train step gathers ray rows on device.
"""

from __future__ import annotations

import dataclasses
import json
import os

import numpy as np

from nerfca_tpu.geometry.rays import detector_rays


def denormalize_image(image: np.ndarray, img_width: int, img_height: int, img_min_max):
    """Stored normalized image -> log-intensity values, transposed into ray
    layout (``data_helpers.py:129-139``)."""
    image = image.reshape((img_width, img_height)).T
    if int(np.min(image)) == 0 and int(np.max(image)) == 1:
        return image * (img_min_max[1] - img_min_max[0]) + img_min_max[0]
    return image


@dataclasses.dataclass
class LoadedDataset:
    """Device-ready training arrays plus the test view."""

    rays: np.ndarray  # [N, 4, 3] rows (origin, dir, pixel, weight)
    phases: np.ndarray  # [N] int32
    info: dict  # general.json contents
    test_frames: list  # raw test frame dicts
    train_frames: list


def prepare_rays(
    frames: list,
    geo_info: dict,
    weighted_loss_max: float = 1.0,
    use_weighting: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Frames -> (``rays [N,4,3]``, ``phases [N]``).

    The pixel and weight scalars are broadcast over the last axis to keep
    the reference's ``[..., 3]`` row shape (``data_helpers.py:146-163``).
    """
    img_width, img_height = (int(v) for v in geo_info["nDetector"])

    ray_stacks, phase_list, pix_list, weight_list = [], [], [], []
    for row in frames:
        o, d = detector_rays(row["theta"], row["phi"], row["larm"], geo_info)
        ray_stacks.append(np.stack([np.asarray(o), np.asarray(d)], axis=0))

        img = denormalize_image(
            np.load(row["file_path"]), img_width, img_height, row["img_min_max"]
        )
        pix_list.append(img)

        if use_weighting and os.path.isfile(row["weighted_file_path"]):
            w = np.load(row["weighted_file_path"]).reshape(
                (img_width, img_height)
            ).T
        else:
            # variance maps exist only when the full 10-phase cycle was
            # processed (datatoray.py:160-161); partial-cycle datasets fall
            # back to unit weights (the reference would crash here)
            w = np.ones((img_width, img_height))
        # [1, 2] -> [1, weighted_loss_max + 1]
        weight_list.append((w - 1.0) * weighted_loss_max + 1.0)

        phase_list.append(np.full((img_width, img_height), row["heart_phase"]))

    rays = np.stack(ray_stacks, 0)  # [N_img, 2, W, H, 3]
    pix = np.repeat(np.stack(pix_list, 0)[:, None, :, :, None], 3, axis=-1)
    wgt = np.repeat(np.stack(weight_list, 0)[:, None, :, :, None], 3, axis=-1)

    rays_all = np.concatenate([rays, pix, wgt], axis=1)  # [N_img, 4, W, H, 3]
    rays_all = np.transpose(rays_all, [0, 2, 3, 1, 4]).reshape(-1, 4, 3)

    phases = np.stack(phase_list, 0).reshape(-1).astype(np.int32)
    return rays_all.astype(np.float32), phases


def load_dataset(
    paths,
    weighted_loss_max: float = 1.0,
    use_weighting: bool = True,
    single_test_frame: bool = True,
    n_test_frames: int = 1,
) -> LoadedDataset:
    """Load a built dataset directory into training arrays.

    ``single_test_frame``: the reference always truncates the test split
    (``run_composite.py:74-76``) — to one image by default; multi-view
    model selection passes ``n_test_frames=K`` to keep the K dedicated
    selection frames that lead test-*.json.
    """
    with open(paths.general) as f:
        info = json.load(f)
    with open(paths.train) as f:
        train_frames = json.load(f)["frames"]
    with open(paths.test) as f:
        test_frames = json.load(f)["frames"]
    if single_test_frame and len(test_frames) > 0:
        test_frames = test_frames[: max(1, int(n_test_frames))]

    rays, phases = prepare_rays(
        train_frames, info, weighted_loss_max, use_weighting
    )
    return LoadedDataset(
        rays=rays,
        phases=phases,
        info=info,
        test_frames=test_frames,
        train_frames=train_frames,
    )
