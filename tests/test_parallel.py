"""SPMD tests on the 8-device virtual CPU mesh: data-parallel training and
the depth-sharded renderer (no reference analog — SURVEY §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nerfca_tpu.models.fields import FieldConfig, init_static_field, init_temporal_field
from nerfca_tpu.ops.render import render_transmission_composite
from nerfca_tpu.ops.sampling import linspace_depths
from nerfca_tpu.models.fields import apply_static_field, apply_temporal_field
from nerfca_tpu.parallel.depth_shard import depth_sharded_render
from nerfca_tpu.parallel.mesh import batch_sharding, make_mesh, replicate
from nerfca_tpu.train.step import (
    TrainState,
    make_composite_train_step,
    make_optimizer,
    make_train_chunk,
)
from tests.test_train_step import make_state, synthetic_rays, tiny_cfgs, tiny_hp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)
    mesh2 = make_mesh(8, axis_names=("data", "depth"), shape=(4, 2))
    assert mesh2.axis_names == ("data", "depth")
    assert mesh2.devices.shape == (4, 2)


def test_data_parallel_step_matches_single_device():
    """The sharded step must produce numerically identical updates."""
    cfgs = tiny_cfgs()
    hp = tiny_hp()
    tx = make_optimizer(1e-3, 1.0, 100)
    rays, phases = synthetic_rays(512)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    dummy = jnp.zeros(1, jnp.int32)

    # single device
    state1 = make_state(cfgs, tx)
    step1 = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    chunk1 = jax.jit(make_train_chunk(step1, 4))
    state1, m1 = chunk1(state1, rays, phases, dummy, dummy)

    # 8-device data parallel
    mesh = make_mesh(8)
    bshard = batch_sharding(mesh)
    state8 = make_state(cfgs, tx)
    state8 = TrainState(
        replicate(mesh, state8.params),
        replicate(mesh, state8.opt_state),
        state8.step,
        state8.rng,
    )
    step8 = make_composite_train_step(cfgs, hp, tx, z, 2.16, batch_sharding=bshard)
    chunk8 = jax.jit(make_train_chunk(step8, 4))
    state8, m8 = chunk8(state8, rays, phases, dummy, dummy)

    np.testing.assert_allclose(
        np.asarray(m1["train_loss"]), np.asarray(m8["train_loss"]), rtol=2e-4
    )
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_depth_sharded_render_matches_dense():
    cfgs = tiny_cfgs()
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    params = {
        "static": init_static_field(k1, cfgs["static"]),
        "temp": init_temporal_field(k2, cfgs["temp"]),
    }
    r, s = 16, 64
    origins = jnp.full((r, 3), jnp.asarray([4.5, 0.0, 0.0]))
    dirs = jnp.tile(jnp.asarray([[-1.0, 0.0, 0.0]]), (r, 1)) + \
        jax.random.normal(key, (r, 3)) * 0.01
    phases = jax.random.randint(key, (r,), 0, 10)
    z = linspace_depths(3.6, 5.4, s)
    windows = {"static": jnp.ones(4), "temp": jnp.ones(4)}

    # dense reference
    pts = origins[:, None, :] + dirs[:, None, :] * z[:, None]
    pph = jnp.broadcast_to(phases[:, None], (r, s)).astype(jnp.int32)
    s_raw = apply_static_field(params["static"], pts, cfgs["static"], windows["static"])
    t_raw = apply_temporal_field(params["temp"], pts, pph, cfgs["temp"], windows["temp"])
    pix_ref, *_ = render_transmission_composite(s_raw, t_raw, jnp.full((r,), 2.16), z)

    mesh = make_mesh(8, axis_names=("depth",))
    pix, s_attn, t_attn = depth_sharded_render(
        mesh, params, origins, dirs, phases, z,
        cfgs["static"], cfgs["temp"], windows, 2.16,
    )
    np.testing.assert_allclose(np.asarray(pix), np.asarray(pix_ref), atol=2e-5)
    # decomposed attns sum to the total attenuation
    np.testing.assert_allclose(
        np.asarray(2.16 - pix), np.asarray(s_attn + t_attn), atol=2e-5
    )


def test_2d_mesh_train_and_render_compose():
    """Train on a ('data','depth') 2-D mesh: batch over 'data'."""
    cfgs = tiny_cfgs()
    hp = tiny_hp(img_sample_size=32)
    tx = make_optimizer(1e-3, 1.0, 100)
    rays, phases = synthetic_rays(256)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    mesh = make_mesh(8, axis_names=("data", "depth"), shape=(4, 2))
    bshard = NamedSharding(mesh, P("data"))
    state = make_state(cfgs, tx)
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16, batch_sharding=bshard)
    chunk = jax.jit(make_train_chunk(step, 2))
    dummy = jnp.zeros(1, jnp.int32)
    state, m = chunk(state, rays, phases, dummy, dummy)
    assert np.isfinite(np.asarray(m["train_loss"])).all()


def test_multihost_helpers_single_process():
    import warnings

    from nerfca_tpu.parallel.multihost import initialize, shard_sweep

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        info = initialize()
    # expected on a single-process host; asserted so the suite stays
    # warning-clean
    assert info["process_count"] > 1 or any(
        "single-process" in str(x.message) for x in w
    )
    assert info["process_count"] >= 1
    grid = list(range(7))
    assert shard_sweep(grid, process_id=0, process_count=2) == [0, 2, 4, 6]
    assert shard_sweep(grid, process_id=1, process_count=2) == [1, 3, 5]
    # this process gets everything in single-process mode
    assert shard_sweep(grid) == grid


def test_multihost_initialize_strict_on_explicit_config(monkeypatch):
    """A misconfigured coordinator must RAISE (not silently degrade to
    single-process) when explicit args are given; the zero-arg
    auto-discovery path degrades with a warning; 'already initialized'
    stays a no-op either way."""
    import warnings

    import jax
    import pytest

    from nerfca_tpu.parallel import multihost

    def boom(**kw):
        raise RuntimeError("connection to coordinator failed")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    with pytest.raises(RuntimeError, match="coordinator"):
        multihost.initialize(coordinator_address="10.0.0.1:1234",
                             num_processes=2, process_id=0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        info = multihost.initialize()
    assert info["process_count"] == 1
    assert any("single-process" in str(x.message) for x in w)

    def already(**kw):
        raise RuntimeError("backend already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", already)
    info = multihost.initialize(coordinator_address="10.0.0.1:1234",
                                num_processes=2, process_id=0)
    assert info["process_count"] == 1


def test_data_parallel_fused_step_matches_single_device(monkeypatch):
    """The monolithic train-gradient Pallas kernel composed with data
    parallelism (shard_map + psum of the per-shard partials) must match the
    single-device fused call on the full batch (VERDICT r2 item 2)."""
    import nerfca_tpu.ops.pallas.fused_field as ff
    from nerfca_tpu.ops.pallas.fused_train import (
        fused_train_loss_and_grads,
        fused_train_loss_and_grads_sharded,
    )
    from nerfca_tpu.ops.encoding import free_window_mask
    from tests.test_fused_train import _setup

    monkeypatch.setattr(ff, "_INTERPRET", True)
    params, cfgs, hp, batch, z = _setup(r=16)
    lw = jnp.asarray([1e-3, 1e-4, 1e-4, 1e-6], jnp.float32)
    windows = {
        k: free_window_mask(cfgs[k].pos_enc_basis, 50, 100, 1)
        for k in ("static", "temp")
    }
    call_args = (
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], windows["static"], windows["temp"],
        lw, hp,
    )

    loss1, terms1, gs1, gt1 = fused_train_loss_and_grads(*call_args)

    mesh = make_mesh(8)
    loss8, terms8, gs8, gt8 = fused_train_loss_and_grads_sharded(
        mesh, "data", *call_args
    )

    np.testing.assert_allclose(np.asarray(loss8), np.asarray(loss1), rtol=1e-5)
    for k in terms1:
        np.testing.assert_allclose(
            np.asarray(terms8[k]), np.asarray(terms1[k]), rtol=1e-5, atol=1e-12,
            err_msg=k,
        )
    for (p1, g1), (p8, g8) in zip(
        sorted(jax.tree_util.tree_leaves_with_path({"s": gs1, "t": gt1}),
               key=lambda kv: str(kv[0])),
        sorted(jax.tree_util.tree_leaves_with_path({"s": gs8, "t": gt8}),
               key=lambda kv: str(kv[0])),
    ):
        assert p1 == p8
        np.testing.assert_allclose(
            np.asarray(g8), np.asarray(g1), rtol=1e-4, atol=1e-7,
            err_msg=str(p1),
        )


def test_data_parallel_fused_full_step(monkeypatch):
    """End-to-end: make_composite_train_step with use_fused_loss AND a
    batch sharding takes the sharded fused path and trains finitely."""
    import dataclasses

    import nerfca_tpu.ops.pallas.fused_field as ff
    from tests.test_fused_train import _setup

    monkeypatch.setattr(ff, "_INTERPRET", True)
    params, cfgs, hp, batch, z = _setup(r=16)
    hp = dataclasses.replace(hp, use_fused_loss=True)
    tx = make_optimizer(1e-3, 1.0, 100)
    rays, phases = synthetic_rays(256)
    mesh = make_mesh(8)
    bshard = batch_sharding(mesh)
    state = TrainState(
        replicate(mesh, {k: params[k] for k in params}),
        replicate(mesh, tx.init(params)),
        jnp.asarray(0, jnp.int32),
        jax.random.PRNGKey(0),
    )
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16, batch_sharding=bshard)
    chunk = jax.jit(make_train_chunk(step, 2))
    dummy = jnp.zeros(1, jnp.int32)
    state, m = chunk(state, rays, phases, dummy, dummy)
    assert np.isfinite(np.asarray(m["train_loss"])).all()
