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


def load_checkpoint(directory: str, example_state: TrainState) -> TrainState:
    """Restore a state saved by :func:`save_checkpoint`.

    ``example_state`` provides the pytree structure/shapes (build it with
    the same configs, then restore over it).
    """
    directory = os.path.abspath(directory)
    with ocp.PyTreeCheckpointer() as ckptr:
        target = {
            "params": example_state.params,
            "opt_state": example_state.opt_state,
            "step": example_state.step,
            "rng": jax.random.key_data(example_state.rng),
        }
        restored = ckptr.restore(
            os.path.join(directory, "state"),
            args=ocp.args.PyTreeRestore(item=target),
        )
    rng = jax.random.wrap_key_data(np.asarray(restored["rng"]))
    return TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        rng=rng,
    )


def load_field_configs(directory: str) -> dict[str, FieldConfig]:
    """Rebuild the FieldConfig dict from checkpoint metadata."""
    with open(os.path.join(directory, "metadata.json")) as f:
        meta = json.load(f)
    return {
        k: FieldConfig(**v) for k, v in meta.get("field_configs", {}).items()
    }
