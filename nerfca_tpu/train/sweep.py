"""Hyperparameter sweep driver.

Reference parity: the wandb grid sweep (``run_composite.py:475-480``,
``train/sweep-composite.yaml``). The same sweep yaml schema is consumed:

    method: grid
    metric: {goal: minimize, name: train_loss}
    parameters: {<flag>: {values: [...]}}
    early_terminate: {type: hyperband, max_iter: N}

Two execution paths:
  - wandb available + ``use_wandb``: ``wandb.sweep``/``wandb.agent`` exactly
    like the reference;
  - otherwise: a LOCAL grid executor expands the cartesian product, runs
    each config sequentially with ``max_iter`` as the step budget (the
    hyperband budget degrades gracefully to a per-run cap), and writes a
    ranked ``sweep_results.json``.
"""

from __future__ import annotations

import itertools
import json
import os
from typing import Callable

import yaml

from nerfca_tpu.train.config import overwrite_args


def load_sweep_config(path: str) -> dict:
    with open(path) as f:
        return yaml.safe_load(f)


def expand_grid(sweep_config: dict) -> list[dict]:
    """All combinations of the ``parameters: {k: {values: [...]}}`` grid."""
    params = sweep_config.get("parameters", {})
    keys, value_lists = [], []
    for key, spec in params.items():
        keys.append(key)
        value_lists.append(spec["values"] if isinstance(spec, dict) else [spec])
    return [dict(zip(keys, combo)) for combo in itertools.product(*value_lists)]


def run_sweep(args, train_fn: Callable) -> list[dict]:
    """Execute the sweep; returns ranked results (local path)."""
    sweep_config = load_sweep_config(args.wandb_sweep_yaml)

    if args.use_wandb:
        try:
            import wandb  # type: ignore

            def agent_main():
                run_args = overwrite_args(args, dict(wandb.config))
                train_fn(run_args)

            sweep_id = wandb.sweep(sweep=sweep_config, project="4D-LIMITED")
            wandb.agent(sweep_id, function=agent_main)
            return []
        except ImportError:
            print("wandb unavailable; falling back to the local sweep executor")

    grid = expand_grid(sweep_config)
    max_iter = (sweep_config.get("early_terminate") or {}).get("max_iter")
    metric = (sweep_config.get("metric") or {}).get("name", "train_loss")
    goal = (sweep_config.get("metric") or {}).get("goal", "minimize")

    results = []
    for i, overrides in enumerate(grid):
        print(f"[sweep {i + 1}/{len(grid)}] {overrides}")
        run_args = overwrite_args(args, overrides)
        run_args.wandb_sweep_yaml = None
        out = train_fn(run_args, max_steps=max_iter)
        score = _final_metric(out["log_dir"], metric)
        results.append(
            {"overrides": overrides, "log_dir": out["log_dir"], metric: score}
        )

    results.sort(
        key=lambda r: (r[metric] if r[metric] is not None else float("inf")),
        reverse=(goal == "maximize"),
    )
    out_path = os.path.join(args.log_dir_root, str(args.data_name), "sweep_results.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"sweep results -> {out_path}")
    return results


def _final_metric(log_dir: str, metric: str):
    """Last logged value of ``metric`` from the run's metrics.jsonl."""
    path = os.path.join(log_dir, "metrics.jsonl")
    value = None
    try:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                if metric in rec:
                    value = rec[metric]
    except OSError:
        pass
    return value
