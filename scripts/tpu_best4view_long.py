"""Long-schedule run of the round-3 4-view quality recipe (TPU).

Batch 8 (BENCH.md round 3) showed the jittered recipe is stable and
monotone over 6k iters (19.6-19.8 dB held from step 1000); this stretches
the same recipe to a longer proportionally-scaled schedule to test
whether the stability buys additional quality (the pre-jitter recipes
overfit past window opening, so long schedules were previously wasted).

Usage: python scripts/tpu_best4view_long.py [n_iters=12000] [resume_ckpt]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_composite
from nerfca_tpu.train import run_eval


def build(n_iters: int, resume=None):
    argv = [
        "--config", "configs/synth-4view-best.txt",
        "--n_iters", str(n_iters),
        "--save_every", "500",
        "--steps_per_chunk", "250",
        "--lr_decay_steps", str(int(n_iters * 0.75)),
        "--static_pos_enc_window_decay_steps", str(int(n_iters * 0.75)),
        "--temp_pos_enc_window_decay_steps", str(int(n_iters * 0.75)),
        "--hyperparam_decay_steps", str(int(n_iters * 0.5)),
        "--favor_s_weight_delay_steps", str(int(n_iters * 0.2)),
        "--use_wandb", "false",
        "--data_root", "data",
        "--log_dir_root", "cases",
    ]
    if resume:
        argv += ["--resume_from", resume]
    return parse_args(argv)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    resume = sys.argv[2] if len(sys.argv) > 2 else None
    args = build(n, resume)
    t0 = time.time()
    out = train_composite(args)
    wall = time.time() - t0
    log_dir = out["log_dir"]
    row = {"n_iters": n, "log_dir": log_dir, "wall_sec": round(wall, 1)}
    for which in ("checkpoint", "checkpoint-best"):
        ckpt = os.path.join(log_dir, which)
        if not os.path.isdir(ckpt):
            continue
        eargs = build(n)
        eargs.resume_from = ckpt
        try:
            scores = run_eval.evaluate_checkpoint(eargs)
            row[which] = {
                "step": scores.get("step"),
                "mean_psnr": scores.get("mean_psnr"),
                "mean_ssim": scores.get("mean_ssim"),
                "mean_dyn_corr": scores.get("mean_dyn_corr"),
                "mean_dyn_psnr": scores.get("mean_dyn_psnr"),
            }
        except Exception as e:  # record, don't abort the ledger write
            print(f"eval failed: {e}")
    print(json.dumps(row), flush=True)
    os.makedirs("cases/SYNTH", exist_ok=True)
    with open("cases/SYNTH/best4view_long.json", "w") as f:
        json.dump([row], f, indent=2)


if __name__ == "__main__":
    main()
