"""Utility-layer tests: activation capture, profiling, geometry viz,
evaluation metrics."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nerfca_tpu.geometry.cone import ConeGeometry, get_near_far, synth_geometry
from nerfca_tpu.models.fields import FieldConfig, init_static_field, init_temporal_field
from nerfca_tpu.train.evaluation import image_psnr, image_ssim, normalize01
from nerfca_tpu.utils.activations import (
    activation_statistics,
    capture_static_activations,
    capture_temporal_activations,
)
from nerfca_tpu.utils.profiling import StepTimer, device_memory_stats
from nerfca_tpu.utils.visualize import visualize_geometry


def small_cfgs():
    kw = dict(num_early_layers=2, num_filters=16, pos_enc="free_windowed",
              pos_enc_basis=4)
    return FieldConfig(**kw), FieldConfig(use_time_latents=True, num_time_dim=4, **kw)


def test_capture_static_activations():
    cfg, _ = small_cfgs()
    params = init_static_field(jax.random.PRNGKey(0), cfg)
    acts = capture_static_activations(params, jnp.ones((8, 3)), cfg, jnp.ones(4))
    assert set(acts) == {"input_layer", "early_0", "early_1", "output"}
    assert acts["early_0"].shape == (8, 16)
    stats = activation_statistics(acts)
    assert 0 <= stats["early_0"]["frac_zero"] <= 1


def test_capture_temporal_activations():
    _, cfg = small_cfgs()
    params = init_temporal_field(jax.random.PRNGKey(1), cfg)
    acts = capture_temporal_activations(
        params, jnp.ones((8, 3)), jnp.zeros(8, jnp.int32), cfg, jnp.ones(4)
    )
    assert "latents" in acts and acts["latents"].shape == (8, 4)


def test_step_timer():
    t = StepTimer(rays_per_step=1024)
    t.start()
    out = t.stop(10)
    assert out["steps_per_sec"] > 0
    assert out["rays_per_sec"] == out["steps_per_sec"] * 1024
    s = t.summary()
    assert s["total_steps"] == 10


def test_device_memory_stats():
    stats = device_memory_stats()
    assert len(stats) >= 1 and "device" in stats[0]


def test_visualize_geometry_writes_png(tmp_path):
    geo = ConeGeometry.from_dict(synth_geometry(50, [24, 24, 24]))
    info = geo.to_info_dict()
    info["near_thresh"], info["far_thresh"] = get_near_far(geo)
    path = str(tmp_path / "geo.png")
    visualize_geometry([[-30, 30], [60, -30]], info, save_path=path)
    assert os.path.isfile(path) and os.path.getsize(path) > 0


def test_image_psnr_ssim():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(32, 32))
    assert image_psnr(img, img) == float("inf")
    assert image_ssim(normalize01(img), normalize01(img)) > 0.999
    noisy = img + rng.normal(0, 0.1, img.shape)
    p = image_psnr(noisy, img)
    assert 10 < p < 30
    assert image_ssim(normalize01(noisy), normalize01(img)) < 0.999
