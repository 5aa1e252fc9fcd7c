"""Additional coverage: alternate encoding modes through the full train
step, MIP dataset artifacts, native projector parity in the builder."""

import argparse
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np

from nerfca_tpu.data.dataset import build_dataset
from nerfca_tpu.models.fields import FieldConfig
from nerfca_tpu.ops.sampling import linspace_depths
from nerfca_tpu.train.step import (
    make_composite_train_step,
    make_optimizer,
    make_train_chunk,
)
from tests.test_train_step import make_state, synthetic_rays, tiny_hp


def _cfgs(pos_enc, basis=4, sigma=0.0):
    kw = dict(
        num_early_layers=2, num_filters=16,
        pos_enc=pos_enc, pos_enc_basis=basis,
        pos_enc_window_start=1, pos_enc_window_decay_steps=100,
        fourier_sigma=sigma,
    )
    return {
        "static": FieldConfig(**kw),
        "temp": FieldConfig(use_time_latents=True, num_time_dim=4, **kw),
    }


def _run_steps(cfgs, n=4):
    hp = tiny_hp()
    tx = make_optimizer(1e-3, 1.0, 100)
    state = make_state(cfgs, tx)
    rays, phases = synthetic_rays(128)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    chunk = jax.jit(make_train_chunk(step, n))
    dummy = jnp.zeros(1, jnp.int32)
    state, m = chunk(state, rays, phases, dummy, dummy)
    return np.asarray(m["train_loss"])


def test_nerfies_windowed_trains():
    losses = _run_steps(_cfgs("nerfies_windowed"))
    assert np.isfinite(losses).all()


def test_fourier_mode_trains():
    losses = _run_steps(_cfgs("fourier", sigma=2.0))
    assert np.isfinite(losses).all()


def test_none_encoding_trains():
    losses = _run_steps(_cfgs("none", basis=0))
    assert np.isfinite(losses).all()


def test_mip_artifacts(tmp_path):
    args = argparse.Namespace(
        data_name="SYNTH", data_size=50, synth_vol_size=16,
        data_limited_range=60.0, data_step_size=120.0, data_numb_angles=4,
        data_time_range_start=0, data_time_range_end=1,
        data_limited_range_test=None, data_step_size_test=None,
        use_experiment_name=False, experiment_name=None, volume_root=None,
    )
    paths = build_dataset(
        args, str(tmp_path / "data"), projector_samples=32, write_mip=True
    )
    mips = [f for f in os.listdir(paths.folder) if f.endswith("-mip.npy")]
    assert len(mips) == 4  # one per test view
    mip = np.load(os.path.join(paths.folder, mips[0]))
    assert mip.shape == (50, 50)
    assert mip.max() > 0


def test_mixed_encoding_fields():
    """Static free_windowed + temporal nerfies_windowed in one step."""
    kw = dict(num_early_layers=1, num_filters=16, pos_enc_basis=4,
              pos_enc_window_start=0, pos_enc_window_decay_steps=50)
    cfgs = {
        "static": FieldConfig(pos_enc="free_windowed", **kw),
        "temp": FieldConfig(
            pos_enc="nerfies_windowed", use_time_latents=True, num_time_dim=4, **kw
        ),
    }
    losses = _run_steps(cfgs)
    assert np.isfinite(losses).all()
