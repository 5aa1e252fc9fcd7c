"""Checkpointing: symmetric save/restore of the FULL train state.

The reference only ever saves model weights + annealing scalars
(``model/CPPN.py:164-180``) and has no load/resume path at all (SURVEY §5).
Here the complete ``TrainState`` — params, optimizer state, step counter,
PRNG key — plus the model/run metadata round-trips through Orbax, giving
true resume semantics (the annealing state is derived from the step, so it
restores for free).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from nerfca_tpu.models.fields import FieldConfig
from nerfca_tpu.train.step import TrainState


def save_checkpoint(
    directory: str,
    state: TrainState,
    cfgs: Optional[dict] = None,
    run_metadata: Optional[dict] = None,
) -> None:
    """Write the train state (and json metadata) to ``directory``."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            os.path.join(directory, "state"),
            {
                "params": state.params,
                "opt_state": state.opt_state,
                "step": state.step,
                "rng": jax.random.key_data(state.rng)
                if jax.dtypes.issubdtype(state.rng.dtype, jax.dtypes.prng_key)
                else state.rng,
            },
            force=True,
        )
    meta: dict[str, Any] = {"format_version": 1}
    if cfgs is not None:
        meta["field_configs"] = {
            k: dataclasses.asdict(v) for k, v in cfgs.items()
        }
    if run_metadata is not None:
        meta["run"] = run_metadata
    with open(os.path.join(directory, "metadata.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)


def load_checkpoint(
    directory: str, example_state: TrainState, *, params_only: bool = False
) -> TrainState:
    """Restore a state saved by :func:`save_checkpoint`.

    ``example_state`` provides the pytree structure/shapes (build it with
    the same configs, then restore over it).

    ``params_only``: skip the optimizer state (kept from ``example_state``)
    — for eval/render/forensics, which never step the optimizer. This
    makes read-only consumers independent of the optimizer CONFIG the run
    trained with: e.g. a ``--weight_decay`` run stores an AdamW chain
    whose pytree structure a plain-Adam example cannot receive (a full
    restore raises orbax's structure-mismatch ValueError). A true resume
    must keep the default full restore and build the matching optimizer.
    """
    directory = os.path.abspath(directory)
    with ocp.PyTreeCheckpointer() as ckptr:
        target = {
            "params": example_state.params,
            "step": example_state.step,
            "rng": jax.random.key_data(example_state.rng),
        }
        if not params_only:
            target["opt_state"] = example_state.opt_state
        # explicit restore args (sharding from the example arrays) so a
        # checkpoint saved on one backend (TPU) restores on another (CPU)
        restore_args = ocp.checkpoint_utils.construct_restore_args(target)
        restored = ckptr.restore(
            os.path.join(directory, "state"),
            args=ocp.args.PyTreeRestore(
                item=target, restore_args=restore_args,
                partial_restore=params_only,
            ),
        )
    rng = jax.random.wrap_key_data(np.asarray(restored["rng"]))
    return TrainState(
        params=restored["params"],
        opt_state=restored.get("opt_state", example_state.opt_state),
        step=restored["step"],
        rng=rng,
    )


class CheckpointManager:
    """Retention policy around :func:`save_checkpoint`.

    Layout under ``root``:
      - ``checkpoint-<step>``: rolling history, last ``keep_last_n`` kept
      - ``checkpoint``: symlink to the latest (the stable resume path)
      - ``checkpoint-best``: symlink to the best-by-metric checkpoint
        (metric reported by the caller, e.g. ``test_image_psnr``)

    The reference overwrites one ``.pth`` set every ``save_every`` iters
    (``run_composite.py:450-461``); this is the superset retention the
    framework's resume/eval paths want.
    """

    def __init__(
        self,
        root: str,
        keep_last_n: int = 3,
        maximize: bool = True,
    ) -> None:
        self.root = os.path.abspath(root)
        self.keep_last_n = max(1, keep_last_n)
        self.maximize = maximize
        self.best_metric: Optional[float] = None
        self.best_step: Optional[int] = None
        # Legacy dirs (symlink, no json): the best checkpoint exists but
        # its metric may be unrecoverable. While it is unknown the link is
        # NON-REPLACEABLE — letting the first post-resume metric win would
        # repoint checkpoint-best to a checkpoint that may be worse than
        # the pre-resume peak (and prune the real best).
        self._best_locked = False
        # A resumed run reuses the log dir: seed best_step/best_metric from
        # the persisted record so _prune never deletes the directory the
        # existing checkpoint-best symlink points to.
        best_json = os.path.join(self.root, "checkpoint-best.json")
        best_link = os.path.join(self.root, "checkpoint-best")
        if os.path.exists(best_json):
            try:
                with open(best_json) as f:
                    rec = json.load(f)
                self.best_metric = float(rec["metric"])
                self.best_step = int(rec["step"])
            except (ValueError, KeyError, json.JSONDecodeError):
                pass
        elif os.path.islink(best_link):
            target = os.path.basename(os.readlink(best_link))
            if target.startswith("checkpoint-") and target[11:].isdigit():
                self.best_step = int(target[11:])
                # newer checkpoints embed their selection metric in their
                # own metadata — recover it so best tracking resumes exactly
                try:
                    with open(os.path.join(
                        self.root, target, "metadata.json"
                    )) as f:
                        m = json.load(f)["run"]["selection_metric"]
                    self.best_metric = float(m)
                except (OSError, KeyError, TypeError, ValueError,
                        json.JSONDecodeError):
                    self._best_locked = True  # metric unknown: pin the link

    def _link(self, name: str, target_dir: str) -> None:
        path = os.path.join(self.root, name)
        if os.path.islink(path):
            os.unlink(path)
        elif os.path.isdir(path):
            import shutil

            shutil.rmtree(path)
        os.symlink(os.path.basename(target_dir), path)

    def save(
        self,
        state: TrainState,
        cfgs: Optional[dict] = None,
        run_metadata: Optional[dict] = None,
        metric: Optional[float] = None,
    ) -> str:
        os.makedirs(self.root, exist_ok=True)
        step = int(np.asarray(state.step))
        directory = os.path.join(self.root, f"checkpoint-{step}")
        if metric is not None:
            # embed the selection metric in the checkpoint's own metadata
            # so a later resume can recover best_metric even if the
            # side-car checkpoint-best.json is lost
            run_metadata = dict(run_metadata or {})
            run_metadata["selection_metric"] = float(metric)
        save_checkpoint(directory, state, cfgs, run_metadata)
        self._link("checkpoint", directory)

        if self._best_locked and metric is not None:
            import warnings

            warnings.warn(
                "checkpoint-best points at a legacy checkpoint with an "
                "unknown metric; keeping it pinned (delete the stale "
                "checkpoint-best symlink to re-enable best tracking)",
                stacklevel=2,
            )  # warnings dedup repeats this once per process
        elif metric is not None and (
            self.best_metric is None
            or (metric > self.best_metric) == self.maximize
        ):
            self.best_metric, self.best_step = float(metric), step
            self._link("checkpoint-best", directory)
            with open(os.path.join(self.root, "checkpoint-best.json"), "w") as f:
                json.dump({"step": step, "metric": self.best_metric}, f)

        self._prune()
        return directory

    def _steps_on_disk(self) -> list[int]:
        steps = []
        for name in os.listdir(self.root):
            prefix = "checkpoint-"
            if name.startswith(prefix) and name[len(prefix):].isdigit():
                steps.append(int(name[len(prefix):]))
        return sorted(steps)

    def _prune(self) -> None:
        import shutil

        keep = set(self._steps_on_disk()[-self.keep_last_n:])
        if self.best_step is not None:
            keep.add(self.best_step)
        for step in self._steps_on_disk():
            if step not in keep:
                shutil.rmtree(
                    os.path.join(self.root, f"checkpoint-{step}"),
                    ignore_errors=True,
                )


def load_field_configs(directory: str) -> dict[str, FieldConfig]:
    """Rebuild the FieldConfig dict from checkpoint metadata."""
    with open(os.path.join(directory, "metadata.json")) as f:
        meta = json.load(f)
    return {
        k: FieldConfig(**v) for k, v in meta.get("field_configs", {}).items()
    }
