"""CLI driver for the static 3-D method (single cardiac phase).

Usage parity with the reference (``train/run_nerf.py:303-323``):

    python -m nerfca_tpu.train.run_nerf --config configs/3d.txt
"""

from __future__ import annotations

import sys
import traceback

from nerfca_tpu.data.dataset import build_dataset
from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_static


def main(argv=None):
    args = parse_args(argv)

    if args.only_prepare_data:
        print("NOT TRAINING, JUST PREPROCESSING DATA")
        args.data_time_range_end = args.data_time_range_start + 1
        build_dataset(args, args.data_root)
        return

    if args.wandb_sweep_yaml:
        from nerfca_tpu.train.sweep import run_sweep

        run_sweep(args, train_static)
        return

    if args.debug_mode:
        print("DEBUG MODE ON")
        import jax

        jax.config.update("jax_debug_nans", True)
        try:
            train_static(args)
        except Exception:
            traceback.print_exc(file=sys.stderr)
            sys.exit(1)
    else:
        train_static(args)


if __name__ == "__main__":
    main()
