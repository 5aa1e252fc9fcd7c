"""Train-step tests: schedules inside jit, loss decrease, parity quirks
(reference loop: ``run_composite.py:227-312``, ``run_nerf.py:186-237``)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerfca_tpu.models.fields import (
    FieldConfig,
    init_static_field,
    init_temporal_field,
)
from nerfca_tpu.ops.sampling import linspace_depths
from nerfca_tpu.train.step import (
    CompositeHParams,
    StaticHParams,
    TrainState,
    composite_loss_fn,
    loss_weights,
    make_composite_train_step,
    make_optimizer,
    make_static_train_step,
    make_train_chunk,
    sample_ray_batch,
)


def tiny_cfgs(fine=False):
    kw = dict(
        num_early_layers=2, num_filters=16,
        pos_enc="free_windowed", pos_enc_basis=4,
        pos_enc_window_start=1, pos_enc_window_decay_steps=200,
    )
    cfgs = {
        "static": FieldConfig(**kw),
        "temp": FieldConfig(use_time_latents=True, num_time_dim=4, **kw),
    }
    if fine:
        cfgs["static_fine"] = dataclasses.replace(cfgs["static"], num_filters=8)
        cfgs["temp_fine"] = dataclasses.replace(cfgs["temp"], num_filters=8)
    return cfgs


def tiny_hp(**kw):
    base = dict(
        img_sample_size=64,
        depth_samples_coarse=32,
        favor_s_weight_start=1e-12, favor_s_weight_end=1e-10,
        favor_s_weight_delay_steps=50,
        dynamic_entro_weight_start=1e-10, dynamic_entro_weight_end=1e-8,
        occl_weight_start=1e-8, occl_weight_end=1e-4,
        l1_weight_start=1e-8, l1_weight_end=1e-15,
        hyperparam_decay_steps=200,
    )
    base.update(kw)
    return CompositeHParams(**base)


def synthetic_rays(n=512, seed=0):
    rng = np.random.default_rng(seed)
    rays = np.zeros((n, 4, 3), np.float32)
    rays[:, 0, :] = [4.5, 0, 0]
    d = np.array([-1.0, 0, 0]) + rng.normal(0, 0.02, (n, 3))
    rays[:, 1, :] = d
    rays[:, 2, :] = (2.1 + 0.05 * rng.random((n, 1))).astype(np.float32)
    rays[:, 3, :] = 1.0
    phases = rng.integers(0, 10, n).astype(np.int32)
    return jnp.asarray(rays), jnp.asarray(phases)


def make_state(cfgs, tx, seed=0):
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 5)
    params = {
        "static": init_static_field(ks[0], cfgs["static"]),
        "temp": init_temporal_field(ks[1], cfgs["temp"]),
    }
    if "static_fine" in cfgs:
        params["static_fine"] = init_static_field(ks[2], cfgs["static_fine"])
        params["temp_fine"] = init_temporal_field(ks[3], cfgs["temp_fine"])
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), ks[4])


def test_sample_ray_batch_uniform():
    rays, phases = synthetic_rays(256)
    hp = tiny_hp()
    batch = sample_ray_batch(
        jax.random.PRNGKey(0), rays, phases, None, None, hp
    )
    assert batch["origins"].shape == (64, 3)
    assert batch["pixels"].shape == (64,)
    assert batch["phases"].shape == (64,)


def test_jitter_directions_geometry():
    from nerfca_tpu.train.step import jitter_directions

    rng = np.random.default_rng(3)
    d = jnp.asarray(
        np.array([0.0, 0.0, 1.0]) + rng.normal(0, 0.05, (128, 3)),
        jnp.float32,
    )
    jit = 4e-4  # one SYNTH pixel footprint
    d2 = jitter_directions(jax.random.PRNGKey(0), d, jit)
    delta = np.asarray(d2 - d)
    # perpendicular to the original ray, bounded by the footprint
    dots = np.abs(np.sum(delta * np.asarray(d), axis=-1))
    assert (dots < 1e-6).all()
    mags = np.linalg.norm(delta, axis=-1)
    assert (mags <= jit / np.sqrt(2) + 1e-7).all()
    assert mags.mean() > jit / 10  # actually perturbs
    # unit-depth scale preserved to O(jitter^2)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(d2), axis=-1),
        np.linalg.norm(np.asarray(d), axis=-1),
        rtol=1e-6,
    )


def test_ray_jitter_off_is_bitwise_reference():
    """ray_jitter=0 must not perturb the rng stream or the trajectory."""
    cfgs = tiny_cfgs()
    tx = make_optimizer(1e-3, 0.01, 100)
    rays, phases = synthetic_rays()
    z_hp = tiny_hp()
    step_off = make_composite_train_step(
        cfgs, z_hp, tx, linspace_depths(3.6, 5.4, 32), 2.16
    )
    step_jit = make_composite_train_step(
        cfgs, dataclasses.replace(z_hp, ray_jitter=4e-4), tx,
        linspace_depths(3.6, 5.4, 32), 2.16,
    )
    s0 = make_state(cfgs, tx)
    s_off, m_off = jax.jit(step_off)(s0, rays, phases, None, None)
    s_on, m_on = jax.jit(step_jit)(make_state(cfgs, tx), rays, phases, None, None)
    # jitter changes the loss (it is active)...
    assert float(m_off["train_loss"]) != float(m_on["train_loss"])
    # ...and the off path matches a second off run bitwise
    s_off2, m_off2 = jax.jit(step_off)(make_state(cfgs, tx), rays, phases, None, None)
    assert float(m_off["train_loss"]) == float(m_off2["train_loss"])


def test_sample_ray_batch_var_oversampling():
    rays, phases = synthetic_rays(256)
    # mark rays 0..9 identifiable via pixel value
    rays = rays.at[:10, 2, :].set(99.0)
    hp = tiny_hp(nb_var_rays=32)
    var_ids = jnp.arange(10, dtype=jnp.int32)
    non_var_ids = jnp.arange(10, 256, dtype=jnp.int32)
    batch = sample_ray_batch(
        jax.random.PRNGKey(1), rays, phases, var_ids, non_var_ids, hp
    )
    n_var = int((np.asarray(batch["pixels"]) == 99.0).sum())
    assert n_var == 32  # exactly the var quota comes from the var set


def test_loss_weights_schedule():
    hp = tiny_hp()
    w0 = jax.tree.map(float, loss_weights(0, hp))
    assert w0["favor_s"] == 0.0 and w0["occl"] == 0.0  # delayed
    assert w0["dynamic_entro"] == pytest.approx(1e-10)
    w_end = jax.tree.map(float, loss_weights(1000, hp))
    assert w_end["favor_s"] == pytest.approx(1e-10)
    assert w_end["occl"] == pytest.approx(1e-4)


def test_composite_loss_finite_and_metrics():
    cfgs = tiny_cfgs()
    hp = tiny_hp()
    tx = make_optimizer(1e-3, 0.01, 100)
    state = make_state(cfgs, tx)
    rays, phases = synthetic_rays()
    batch = sample_ray_batch(jax.random.PRNGKey(0), rays, phases, None, None, hp)
    batch["initial_intensities"] = jnp.full((hp.img_sample_size,), 2.16)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    loss, metrics = composite_loss_fn(state.params, batch, z, 0, cfgs, hp)
    assert np.isfinite(float(loss))
    for key in ("train_loss", "train_psnr", "train_pixel_loss_coarse",
                "train_blendw", "train_favor_s_loss", "train_s_entropy_loss",
                "train_d_entropy_loss", "train_d_occl_loss", "train_s_l1",
                "train_s_l2", "train_static_windowed"):
        assert key in metrics and np.isfinite(float(metrics[key])), key
    # psnr consistency quirk
    np.testing.assert_allclose(
        float(metrics["train_psnr"]), -10 * np.log10(float(loss)), rtol=1e-5
    )


def test_training_reduces_loss():
    cfgs = tiny_cfgs()
    hp = tiny_hp()
    tx = make_optimizer(1e-2, 1.0, 1000)
    state = make_state(cfgs, tx)
    rays, phases = synthetic_rays(1024)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    chunk = jax.jit(make_train_chunk(step, 30))
    state, m1 = chunk(state, rays, phases, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
    state, m2 = chunk(state, rays, phases, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
    first = float(np.asarray(m1["train_pixel_loss_coarse"])[:3].mean())
    last = float(np.asarray(m2["train_pixel_loss_coarse"])[-3:].mean())
    assert last < first, (first, last)
    assert int(state.step) == 60


def test_weight_decay_masks_w_leaves_only():
    """--weight_decay (framework extension): decoupled AdamW decay applies
    to the MLP weight matrices only; biases and time latents are exempt;
    0.0 reproduces the exact reference Adam update."""
    cfgs = tiny_cfgs()
    params = make_state(cfgs, make_optimizer(1e-3, 1.0, 100)).params
    grads = jax.tree.map(jnp.zeros_like, params)

    tx_wd = make_optimizer(1e-2, 1.0, 100, weight_decay=0.1)
    upd, _ = tx_wd.update(grads, tx_wd.init(params), params)
    flat = jax.tree_util.tree_flatten_with_path(upd)[0]
    for path, leaf in flat:
        keys = [getattr(k, "key", None) for k in path]
        if "w" in keys:
            # zero grad + decay -> a strictly shrinking update
            assert float(jnp.abs(leaf).max()) > 0, path
        else:
            np.testing.assert_allclose(np.asarray(leaf), 0.0, err_msg=str(path))

    tx0 = make_optimizer(1e-2, 1.0, 100)  # default: exact reference Adam
    upd0, _ = tx0.update(grads, tx0.init(params), params)
    for leaf in jax.tree.leaves(upd0):
        np.testing.assert_allclose(np.asarray(leaf), 0.0)


def test_fine_hierarchy_path():
    cfgs = tiny_cfgs(fine=True)
    hp = tiny_hp(depth_samples_fine=8)
    tx = make_optimizer(1e-3, 1.0, 100)
    state = make_state(cfgs, tx)
    rays, phases = synthetic_rays(256)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    chunk = jax.jit(make_train_chunk(step, 3))
    state, metrics = chunk(
        state, rays, phases, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32)
    )
    assert "train_pixel_loss_fine" in metrics
    assert np.isfinite(np.asarray(metrics["train_loss"])).all()
    assert np.isfinite(np.asarray(metrics["train_pixel_loss_fine"])).all()


def test_static_method_step():
    cfg = tiny_cfgs()["static"]
    hp = StaticHParams(
        img_sample_size=64, depth_samples_coarse=32,
        occl_weight_start=1e-4, occl_reg_perc=0.1,
    )
    tx = make_optimizer(1e-2, 1.0, 1000)
    key = jax.random.PRNGKey(0)
    params = {"static": init_static_field(key, cfg)}
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32), key)
    rays, phases = synthetic_rays(512)
    z = linspace_depths(3.6, 5.4, 32)
    step = make_static_train_step(cfg, hp, tx, z, 2.16)
    chunk = jax.jit(make_train_chunk(step, 25))
    state, m = chunk(state, rays, phases, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
    losses = np.asarray(m["train_loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert "train_occl_loss" in m


def test_windowed_alpha_metric_progression():
    cfgs = tiny_cfgs()
    hp = tiny_hp()
    tx = make_optimizer(1e-3, 1.0, 100)
    state = make_state(cfgs, tx)
    rays, phases = synthetic_rays(128)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    chunk = jax.jit(make_train_chunk(step, 10))
    _, m = chunk(state, rays, phases, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
    alphas = np.asarray(m["train_static_windowed"])
    # ptr = 4*step/200 + 1, strictly increasing during decay
    np.testing.assert_allclose(alphas[0], 1.0, atol=1e-5)
    assert (np.diff(alphas) > 0).all()


def test_bf16_compute_dtype_trains():
    cfgs = tiny_cfgs()
    hp = tiny_hp(compute_dtype="bfloat16")
    tx = make_optimizer(1e-2, 1.0, 1000)
    state = make_state(cfgs, tx)
    rays, phases = synthetic_rays(256)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    chunk = jax.jit(make_train_chunk(step, 5))
    state, m = chunk(state, rays, phases, jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
    assert np.isfinite(np.asarray(m["train_loss"])).all()
    # params stay f32
    assert state.params["static"]["out"]["w"].dtype == jnp.float32


def test_train_chunk_n_valid_masks_tail_steps():
    """chunk(.., n_valid=k) must leave state EXACTLY as running k steps:
    the tail remainder reuses the full-length compiled graph with the extra
    steps masked to no-ops (no re-jit of a shorter scan)."""
    cfgs = tiny_cfgs()
    hp = tiny_hp()
    tx = make_optimizer(1e-3, 0.01, 100)
    rays, phases = synthetic_rays()
    step = make_composite_train_step(
        cfgs, hp, tx, linspace_depths(3.6, 5.4, hp.depth_samples_coarse), 2.16
    )

    chunk5 = jax.jit(make_train_chunk(step, 5))
    state_a, metrics_a = chunk5(make_state(cfgs, tx), rays, phases, None, None, 3)
    chunk3 = jax.jit(make_train_chunk(step, 3))
    state_b, metrics_b = chunk3(make_state(cfgs, tx), rays, phases, None, None)

    assert int(state_a.step) == 3 == int(state_b.step)
    # tolerance: XLA fuses the length-5 and length-3 scans differently, so
    # identical math lands within float noise, not bitwise equal
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        state_a.params,
        state_b.params,
    )
    # the first n_valid metric entries are the real ones
    np.testing.assert_allclose(
        np.asarray(metrics_a["train_loss"])[:3],
        np.asarray(metrics_b["train_loss"]),
        rtol=1e-5,
    )


def test_static_freeze_stops_static_updates_only():
    from nerfca_tpu.train.step import schedule_from_hp

    cfgs = tiny_cfgs()
    tx = make_optimizer(1e-3, 0.01, 100)
    rays, phases = synthetic_rays()
    hp = tiny_hp(static_freeze_step=1)
    step_fn = jax.jit(make_composite_train_step(
        cfgs, hp, tx, linspace_depths(3.6, 5.4, 32), 2.16
    ))
    s = make_state(cfgs, tx)
    sched = schedule_from_hp(hp)
    # step 0 < freeze: both fields update
    s1, _ = step_fn(s, rays, phases, None, None, sched)
    d_static0 = float(jnp.abs(s1.params["static"]["early"][0]["w"] - s.params["static"]["early"][0]["w"]).max())
    assert d_static0 > 0
    # step 1 >= freeze: static frozen, temp still training
    s2, _ = step_fn(s1, rays, phases, None, None, sched)
    d_static = float(jnp.abs(s2.params["static"]["early"][0]["w"] - s1.params["static"]["early"][0]["w"]).max())
    d_temp = float(jnp.abs(s2.params["temp"]["early"][0]["w"] - s1.params["temp"]["early"][0]["w"]).max())
    assert d_static == 0.0
    assert d_temp > 0
    # freeze=0 (off) leaves both training — SAME compiled step, new sched
    hp_off = tiny_hp(static_freeze_step=0)
    s3, _ = step_fn(s1, rays, phases, None, None, schedule_from_hp(hp_off))
    d_static_off = float(jnp.abs(s3.params["static"]["early"][0]["w"] - s1.params["static"]["early"][0]["w"]).max())
    assert d_static_off > 0


def test_traced_schedule_changes_weights_without_retrace():
    """The loss-weight schedule rides in as a traced input: one compiled
    chunk serves configs that differ only in regularizer weights (sweeps
    would otherwise pay a multi-minute remote compile per config)."""
    from nerfca_tpu.train.step import schedule_from_hp

    cfgs = tiny_cfgs()
    hp_a = tiny_hp(favor_s_weight_start=1e-3, favor_s_weight_end=1e-2,
                   favor_s_weight_delay_steps=0)
    hp_b = tiny_hp(favor_s_weight_start=1e-1, favor_s_weight_end=1e-1,
                   favor_s_weight_delay_steps=0)
    tx = make_optimizer(1e-3, 0.01, 100)
    rays, phases = synthetic_rays()
    # ONE step built from hp_a; hp_b's weights arrive via sched
    step = make_composite_train_step(
        cfgs, hp_a, tx, linspace_depths(3.6, 5.4, hp_a.depth_samples_coarse), 2.16
    )
    chunk = jax.jit(make_train_chunk(step, 2))

    _, m_a = chunk(make_state(cfgs, tx), rays, phases, None, None, 2,
                   schedule_from_hp(hp_a))
    size_after_first = chunk._cache_size()
    _, m_b = chunk(make_state(cfgs, tx), rays, phases, None, None, 2,
                   schedule_from_hp(hp_b))
    assert chunk._cache_size() == size_after_first  # no retrace
    # the weights actually took effect (favor term differs)
    assert not np.allclose(
        np.asarray(m_a["favor_s_weight"]), np.asarray(m_b["favor_s_weight"])
    )
    assert not np.allclose(
        np.asarray(m_a["train_loss"]), np.asarray(m_b["train_loss"])
    )


def test_mixed_pass_pallas_gating_matches_xla(monkeypatch):
    """Hierarchical forward with a fused-supported coarse pair (width 128)
    and an UNSUPPORTED fine pair (width 64): use_pallas=True must run the
    coarse pass through the fused kernel (interpret mode here) and the
    fine pass on XLA, and match the all-XLA forward exactly in shape and
    closely in value."""
    from nerfca_tpu.ops.pallas import fused_field as ff
    from nerfca_tpu.train.step import composite_forward, field_window

    monkeypatch.setattr(ff, "_INTERPRET", True)
    kw = dict(
        num_early_layers=2, num_filters=128,
        pos_enc="free_windowed", pos_enc_basis=4,
        pos_enc_window_start=1, pos_enc_window_decay_steps=200,
    )
    cfgs = {
        "static": FieldConfig(**kw),
        "temp": FieldConfig(use_time_latents=True, num_time_dim=8, **kw),
    }
    cfgs["static_fine"] = dataclasses.replace(cfgs["static"], num_filters=64)
    cfgs["temp_fine"] = dataclasses.replace(cfgs["temp"], num_filters=64)
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 6)
    params = {
        "static": init_static_field(ks[0], cfgs["static"]),
        "temp": init_temporal_field(ks[1], cfgs["temp"]),
        "static_fine": init_static_field(ks[2], cfgs["static_fine"]),
        "temp_fine": init_temporal_field(ks[3], cfgs["temp_fine"]),
    }
    r, s = 4, 33
    hp = tiny_hp(img_sample_size=r, depth_samples_coarse=s,
                 depth_samples_fine=8, use_pallas=True)
    batch = {
        "origins": jnp.full((r, 3), jnp.asarray([4.5, 0.0, 0.0])),
        "directions": jax.random.normal(ks[4], (r, 3)) * 0.02
        + jnp.asarray([-1.0, 0.0, 0.0]),
        "pixels": jnp.full((r,), 2.1),
        "weights": jnp.ones((r,)),
        "phases": jax.random.randint(ks[5], (r,), 0, 10),
        "initial_intensities": jnp.full((r,), 2.16),
    }
    z = linspace_depths(3.6, 5.4, s)
    step = jnp.asarray(11)
    windows = {
        "static": field_window(cfgs["static"], step),
        "temp": field_window(cfgs["temp"], step),
    }
    rng = jax.random.PRNGKey(9)
    out_p = composite_forward(params, batch, z, windows, cfgs, hp, rng=rng)
    hp_x = dataclasses.replace(hp, use_pallas=False)
    out_x = composite_forward(params, batch, z, windows, cfgs, hp_x, rng=rng)
    assert "pix_fine" in out_p
    for k in ("pix_coarse", "pix_fine", "static_sigma_fine"):
        np.testing.assert_allclose(
            np.asarray(out_p[k]), np.asarray(out_x[k]), rtol=2e-5, atol=1e-7,
            err_msg=k,
        )
