"""Regularizer-weight sweep at the 4-view operating point (TPU).

Runs configs/sweep-4view-data.yaml through the local sweep executor at
a compressed paper-proportional schedule. All configs share ONE compiled
train step (the weight schedule is a traced input), so the sweep costs
one compile + pure step time.

Usage: python scripts/tpu_weight_sweep.py [n_iters=40000]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.sweep import run_sweep
from nerfca_tpu.train.trainer import train_composite


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    args = parse_args([
        "--config", "configs/composite.txt",
        "--data_name", "SYNTH",
        "--data_size", "200",
        "--synth_vol_size", "96",
        "--n_iters", str(n),
        "--display_every", "2000",
        "--save_every", str(n),
        "--log_every", "200",
        "--steps_per_chunk", "500",
        "--lr_decay_steps", str(int(n * 0.75)),
        "--static_pos_enc_window_decay_steps", str(int(n * 0.75)),
        "--temp_pos_enc_window_decay_steps", str(int(n * 0.75)),
        "--hyperparam_decay_steps", str(int(n * 0.5)),
        "--favor_s_weight_delay_steps", str(int(n * 0.2)),
        "--use_pallas", "true",
        "--use_fused_loss", "true",
        "--use_wandb", "false",
        "--data_root", "data",
        "--log_dir_root", "cases",
        "--wandb_sweep_yaml", "configs/sweep-4view-data.yaml",
    ])
    t0 = time.time()
    results = run_sweep(args, train_composite)
    print(f"\nsweep wall {time.time()-t0:.0f}s")
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
