"""Checkpoint save/restore round-trip tests (the reference is save-only with
no resume path — SURVEY §5; here resume is first-class)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerfca_tpu.ops.sampling import linspace_depths
from nerfca_tpu.train.checkpoint import (
    load_checkpoint,
    load_field_configs,
    save_checkpoint,
)
from nerfca_tpu.train.step import make_composite_train_step, make_optimizer, make_train_chunk
from tests.test_train_step import make_state, synthetic_rays, tiny_cfgs, tiny_hp


def test_roundtrip_preserves_state(tmp_path):
    cfgs = tiny_cfgs()
    tx = make_optimizer(1e-3, 0.1, 100)
    state = make_state(cfgs, tx)
    # advance a few steps so opt_state and step are nontrivial
    hp = tiny_hp()
    rays, phases = synthetic_rays(128)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    chunk = jax.jit(make_train_chunk(step, 3))
    dummy = jnp.zeros(1, jnp.int32)
    state, _ = chunk(state, rays, phases, dummy, dummy)

    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, cfgs, run_metadata={"note": "test"})

    fresh = make_state(cfgs, tx, seed=99)
    restored = load_checkpoint(ckpt_dir, fresh)

    assert int(restored.step) == int(state.step) == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree_util.tree_leaves(state.opt_state),
        jax.tree_util.tree_leaves(restored.opt_state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_params_only_restore_across_optimizer_configs(tmp_path):
    """A --weight_decay run stores an AdamW opt_state whose pytree a
    plain-Adam example cannot receive; eval/render restore params_only and
    must work regardless of the optimizer the run trained with."""
    import pytest

    cfgs = tiny_cfgs()
    tx_wd = make_optimizer(1e-3, 0.1, 100, weight_decay=1e-3)
    state = make_state(cfgs, tx_wd)
    ckpt_dir = str(tmp_path / "ckpt")
    save_checkpoint(ckpt_dir, state, cfgs)

    tx_plain = make_optimizer(1e-3, 0.1, 100)
    fresh = make_state(cfgs, tx_plain, seed=99)
    # full restore across optimizer configs must fail loudly (a resume
    # must build the optimizer the run trained with) ...
    with pytest.raises(Exception):
        load_checkpoint(ckpt_dir, fresh)
    # ... while the read-only path restores params/step/rng fine
    restored = load_checkpoint(ckpt_dir, fresh, params_only=True)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_resume_continues_identically(tmp_path):
    """train 3 -> save -> train 3 more must equal train 6 straight."""
    cfgs = tiny_cfgs()
    hp = tiny_hp()
    tx = make_optimizer(1e-3, 0.1, 100)
    rays, phases = synthetic_rays(128)
    z = linspace_depths(3.6, 5.4, hp.depth_samples_coarse)
    step = make_composite_train_step(cfgs, hp, tx, z, 2.16)
    chunk3 = jax.jit(make_train_chunk(step, 3))
    chunk6 = jax.jit(make_train_chunk(step, 6))
    dummy = jnp.zeros(1, jnp.int32)

    s_direct = make_state(cfgs, tx)
    s_direct, m6 = chunk6(s_direct, rays, phases, dummy, dummy)

    s_a = make_state(cfgs, tx)
    s_a, _ = chunk3(s_a, rays, phases, dummy, dummy)
    save_checkpoint(str(tmp_path / "c"), s_a, cfgs)
    s_b = load_checkpoint(str(tmp_path / "c"), make_state(cfgs, tx, seed=7))
    s_b, m_resumed = chunk3(s_b, rays, phases, dummy, dummy)

    np.testing.assert_allclose(
        np.asarray(m6["train_loss"])[3:],
        np.asarray(m_resumed["train_loss"]),
        rtol=1e-6,
    )


def test_field_config_metadata_roundtrip(tmp_path):
    cfgs = tiny_cfgs(fine=True)
    tx = make_optimizer(1e-3, 0.1, 100)
    state = make_state(cfgs, tx)
    save_checkpoint(str(tmp_path / "c"), state, cfgs)
    loaded = load_field_configs(str(tmp_path / "c"))
    assert set(loaded) == {"static", "temp", "static_fine", "temp_fine"}
    assert loaded["static"] == cfgs["static"]
    assert loaded["temp_fine"].num_filters == 8


def test_checkpoint_manager_retention(tmp_path):
    """keep-last-N rolling history + best-by-metric retention + the stable
    'checkpoint' symlink the resume/eval paths read."""
    import os

    from nerfca_tpu.train.checkpoint import CheckpointManager

    cfgs = tiny_cfgs()
    tx = make_optimizer(1e-3, 0.01, 100)
    state = make_state(cfgs, tx)
    mgr = CheckpointManager(str(tmp_path), keep_last_n=2)

    import jax.numpy as jnp

    metrics = [10.0, 30.0, 20.0, 25.0]  # best lands at step 1
    for i, m in enumerate(metrics):
        st = state._replace(step=jnp.asarray(i, jnp.int32))
        mgr.save(st, cfgs, metric=m)

    names = sorted(os.listdir(tmp_path))
    # last 2 steps (2, 3) plus the best (1); step 0 pruned
    assert "checkpoint-2" in names and "checkpoint-3" in names
    assert "checkpoint-1" in names and "checkpoint-0" not in names
    assert os.path.islink(os.path.join(tmp_path, "checkpoint"))
    assert os.readlink(os.path.join(tmp_path, "checkpoint")) == "checkpoint-3"
    assert os.readlink(os.path.join(tmp_path, "checkpoint-best")) == "checkpoint-1"

    # the stable path restores the LATEST state
    restored = load_checkpoint(str(tmp_path / "checkpoint"), make_state(cfgs, tx))
    assert int(restored.step) == 3


def test_checkpoint_manager_resume_preserves_best(tmp_path):
    """A resumed run builds a FRESH manager over the same log dir: the
    persisted best record must seed it so pruning never deletes (or a
    worse later metric never displaces) the existing best checkpoint."""
    import os

    from nerfca_tpu.train.checkpoint import CheckpointManager

    cfgs = tiny_cfgs()
    tx = make_optimizer(1e-3, 0.01, 100)
    state = make_state(cfgs, tx)

    mgr = CheckpointManager(str(tmp_path), keep_last_n=1)
    for i, m in enumerate([10.0, 30.0]):  # best at step 1
        mgr.save(state._replace(step=jnp.asarray(i, jnp.int32)), cfgs, metric=m)

    # resume: new manager, same dir, worse metrics arriving at later steps
    mgr2 = CheckpointManager(str(tmp_path), keep_last_n=1)
    assert mgr2.best_step == 1 and mgr2.best_metric == 30.0
    for i, m in enumerate([5.0, 7.0], start=2):
        mgr2.save(state._replace(step=jnp.asarray(i, jnp.int32)), cfgs, metric=m)

    assert os.readlink(os.path.join(tmp_path, "checkpoint-best")) == "checkpoint-1"
    assert os.path.isdir(os.path.join(tmp_path, "checkpoint-1"))  # not pruned


def test_checkpoint_manager_legacy_symlink_metric_recovery(tmp_path):
    """Legacy dirs (best symlink, no checkpoint-best.json): the metric is
    recovered from the checkpoint's own embedded selection_metric, so best
    tracking resumes exactly (ADVICE r3: the first post-resume save must
    not unconditionally displace the pre-resume peak)."""
    import json
    import os

    from nerfca_tpu.train.checkpoint import CheckpointManager

    cfgs = tiny_cfgs()
    tx = make_optimizer(1e-3, 0.01, 100)
    state = make_state(cfgs, tx)

    mgr = CheckpointManager(str(tmp_path), keep_last_n=2)
    for i, m in enumerate([10.0, 30.0]):  # best at step 1
        mgr.save(state._replace(step=jnp.asarray(i, jnp.int32)), cfgs, metric=m)
    os.remove(tmp_path / "checkpoint-best.json")  # simulate a legacy dir

    mgr2 = CheckpointManager(str(tmp_path), keep_last_n=2)
    assert mgr2.best_step == 1 and mgr2.best_metric == 30.0  # recovered
    mgr2.save(state._replace(step=jnp.asarray(2, jnp.int32)), cfgs, metric=5.0)
    assert os.readlink(os.path.join(tmp_path, "checkpoint-best")) == "checkpoint-1"
    mgr2.save(state._replace(step=jnp.asarray(3, jnp.int32)), cfgs, metric=31.0)
    assert os.readlink(os.path.join(tmp_path, "checkpoint-best")) == "checkpoint-3"


def test_checkpoint_manager_legacy_unknown_metric_pins_best(tmp_path):
    """When the legacy best's metric is UNRECOVERABLE the link is pinned:
    a post-resume metric never repoints (or prunes) it."""
    import json
    import os
    import warnings

    from nerfca_tpu.train.checkpoint import CheckpointManager

    cfgs = tiny_cfgs()
    tx = make_optimizer(1e-3, 0.01, 100)
    state = make_state(cfgs, tx)

    mgr = CheckpointManager(str(tmp_path), keep_last_n=1)
    for i, m in enumerate([10.0, 30.0]):
        mgr.save(state._replace(step=jnp.asarray(i, jnp.int32)), cfgs, metric=m)
    os.remove(tmp_path / "checkpoint-best.json")
    # strip the embedded metric too (a truly ancient checkpoint)
    meta_path = tmp_path / "checkpoint-1" / "metadata.json"
    meta = json.load(open(meta_path))
    meta.get("run", {}).pop("selection_metric", None)
    json.dump(meta, open(meta_path, "w"))

    mgr2 = CheckpointManager(str(tmp_path), keep_last_n=1)
    assert mgr2.best_step == 1 and mgr2.best_metric is None
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        mgr2.save(state._replace(step=jnp.asarray(2, jnp.int32)), cfgs,
                  metric=99.0)
        assert any("pinned" in str(w.message) for w in rec)
    assert os.readlink(os.path.join(tmp_path, "checkpoint-best")) == "checkpoint-1"
    assert os.path.isdir(tmp_path / "checkpoint-1")  # never pruned
