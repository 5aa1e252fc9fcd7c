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
  - otherwise: a LOCAL grid executor expands the cartesian product and runs
    it under successive-halving hyperband (``early_terminate: {type:
    hyperband, max_iter: N}``, eta default 3): every config trains to the
    first rung, the best 1/eta survive to the next rung (resumed from their
    checkpoints — annealing schedules continue from the saved step), and so
    on until ``max_iter``. ``sweep_results.json`` records the rungs and
    promotions plus the final ranking. Without an ``early_terminate``
    block, every config simply trains to ``n_iters``.
"""

from __future__ import annotations

import itertools
import json
import math
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
    early = sweep_config.get("early_terminate") or {}
    max_iter = early.get("max_iter")
    metric = (sweep_config.get("metric") or {}).get("name", "train_loss")
    goal = (sweep_config.get("metric") or {}).get("goal", "minimize")

    if early.get("type") == "hyperband" and max_iter and len(grid) > 1:
        results, rungs = _run_hyperband(
            args, train_fn, grid, metric, goal,
            max_iter=int(max_iter),
            eta=int(early.get("eta", 3)),
            s=int(early.get("s", 2)),
        )
    else:
        rungs = None
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
        key=lambda r: _rank_value(r[metric], goal),
        reverse=(goal == "maximize"),
    )
    out_path = os.path.join(args.log_dir_root, str(args.data_name), "sweep_results.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    payload = {"results": results} if rungs is None else {
        "results": results,
        "hyperband": rungs,
    }
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"sweep results -> {out_path}")
    return results


def _rank_value(value, goal: str) -> float:
    """Sort key with None/NaN pushed to the losing end."""
    import math

    bad = float("-inf") if goal == "maximize" else float("inf")
    if value is None:
        return bad
    v = float(value)
    return v if math.isfinite(v) else bad


def hyperband_rungs(max_iter: int, eta: int = 3, s: int = 2) -> list[int]:
    """Successive-halving rung budgets ``[max_iter/eta^s, ..., max_iter]``
    (the wandb hyperband schedule shape for ``early_terminate.max_iter``,
    reference ``train/sweep-composite.yaml:9-11``)."""
    return [max(1, int(max_iter / eta**k)) for k in range(s, -1, -1)]


def _run_hyperband(args, train_fn, grid, metric, goal, *, max_iter, eta, s):
    """Successive halving: all configs train to rung 0; the best
    ``ceil(n/eta)`` resume from their checkpoints to the next rung."""
    rung_iters = hyperband_rungs(max_iter, eta, s)
    survivors = list(range(len(grid)))
    last = {i: None for i in survivors}  # config idx -> last run record
    rung_log = []

    for r_idx, budget in enumerate(rung_iters):
        print(
            f"[hyperband rung {r_idx + 1}/{len(rung_iters)}] "
            f"budget={budget} configs={survivors}"
        )
        for ci in survivors:
            overrides = grid[ci]
            run_args = overwrite_args(args, overrides)
            run_args.wandb_sweep_yaml = None
            prior = last[ci]
            if prior is not None:
                run_args.resume_from = os.path.join(
                    prior["log_dir"], "checkpoint"
                )
            out = train_fn(run_args, max_steps=budget)
            score = _final_metric(out["log_dir"], metric)
            last[ci] = {
                "overrides": overrides,
                "log_dir": out["log_dir"],
                metric: score,
            }
            print(f"  config {ci} {overrides}: {metric}={score}")

        ranked = sorted(
            survivors,
            key=lambda ci: _rank_value(last[ci][metric], goal),
            reverse=(goal == "maximize"),
        )
        rung_log.append(
            {
                "rung": r_idx,
                "budget": budget,
                "scores": {str(ci): last[ci][metric] for ci in survivors},
            }
        )
        if r_idx < len(rung_iters) - 1:
            n_keep = max(1, math.ceil(len(survivors) / eta))
            survivors = ranked[:n_keep]
            rung_log[-1]["promoted"] = survivors

    results = [last[ci] for ci in sorted(last) if last[ci] is not None]
    return results, {"eta": eta, "rung_iters": rung_iters, "rungs": rung_log}


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
