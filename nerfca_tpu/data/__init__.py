"""Data layer: phantoms, dataset builder, ray loader.

Reference parity: ``preprocess/*`` and ``train/data_helpers.py`` in
kirstenmaas/NeRF-CA, with a synthetic dynamic phantom standing in for the
proprietary XCAT binary.
"""

from nerfca_tpu.data.phantom import synthetic_phantom_volume, synthetic_phantom_series
from nerfca_tpu.data.dataset import build_dataset, DatasetPaths
from nerfca_tpu.data.loader import (
    load_dataset,
    prepare_rays,
    denormalize_image,
    LoadedDataset,
)
from nerfca_tpu.data.views import select_views, CLINICAL_TEST_ANGLES, FOUR_VIEW_PRESET

__all__ = [
    "synthetic_phantom_volume",
    "synthetic_phantom_series",
    "build_dataset",
    "DatasetPaths",
    "load_dataset",
    "prepare_rays",
    "denormalize_image",
    "LoadedDataset",
    "select_views",
    "CLINICAL_TEST_ANGLES",
    "FOUR_VIEW_PRESET",
]
