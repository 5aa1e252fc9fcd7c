"""CLI driver for the composite 4-D method.

Usage parity with the reference (``train/run_composite.py:463-482``):

    python -m nerfca_tpu.train.run_composite --config configs/composite.txt
    python -m nerfca_tpu.train.run_composite --config ... --only_prepare_data true
    python -m nerfca_tpu.train.run_composite --config ... --wandb_sweep_yaml sweep.yaml

Sweeps: when a sweep yaml is provided, the grid is expanded and executed
locally (wandb's agent is used instead when wandb is importable and
``use_wandb`` is true) — see ``nerfca_tpu.train.sweep``.
"""

from __future__ import annotations

import sys
import traceback

from nerfca_tpu.data.dataset import build_dataset
from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_composite


def main(argv=None):
    args = parse_args(argv)

    if args.only_prepare_data:
        print("NOT TRAINING, JUST PREPROCESSING DATA")
        build_dataset(args, args.data_root)
        return

    if args.wandb_sweep_yaml:
        from nerfca_tpu.train.sweep import run_sweep

        run_sweep(args, train_composite)
        return

    if args.debug_mode:
        # debug wrapper + NaN guard: the reference's try/except traceback
        # (run_composite.py:26-34) plus device-side non-finite detection
        print("DEBUG MODE ON")
        import jax

        jax.config.update("jax_debug_nans", True)
        try:
            train_composite(args)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            sys.exit(1)
    else:
        train_composite(args)


if __name__ == "__main__":
    main()
