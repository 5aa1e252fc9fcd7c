"""Longer flagship run on TPU with paper-proportional schedules.

Usage: python scripts/tpu_long_run.py [n_iters=50000] [resume_checkpoint] [extra flags...]
All annealing schedules scale with n_iters at the paper's proportions
(window/lr decay = 75% of run, hyperparam decay = 50%, favor delay = 20%).
Pass a checkpoint dir as the second arg to continue a wedged/killed run
(the remote-compile tunnel occasionally hangs; schedules derive from the
restored step, so resume is exact).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_composite


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50000
    resume = None
    extra = []
    rest = sys.argv[2:]
    if rest and not rest[0].startswith("--"):
        resume, rest = rest[0], rest[1:]
    extra = list(rest)
    args = parse_args(([] if resume is None else ["--resume_from", resume]) + [
        "--config", "configs/composite.txt",
        "--data_name", "SYNTH",
        "--data_size", "200",
        "--synth_vol_size", "96",
        "--n_iters", str(n),
        "--display_every", "2000",
        "--save_every", "10000",
        "--log_every", "100",
        "--steps_per_chunk", "500" if n >= 10000 else "100",
        "--lr_decay_steps", str(int(n * 0.75)),
        "--static_pos_enc_window_decay_steps", str(int(n * 0.75)),
        "--temp_pos_enc_window_decay_steps", str(int(n * 0.75)),
        "--hyperparam_decay_steps", str(int(n * 0.5)),
        "--favor_s_weight_delay_steps", str(int(n * 0.2)),
        "--use_pallas", "true",
        "--use_fused_loss", "true",
        "--data_root", "data",
        "--log_dir_root", "cases",
    ] + extra)  # extras last so callers can override any default above
    t0 = time.time()
    out = train_composite(args)
    wall = time.time() - t0
    recs = [json.loads(l) for l in open(os.path.join(out["log_dir"], "metrics.jsonl"))]
    tests = [r for r in recs if "test_image_psnr" in r]
    print(f"\nwall {wall:.0f}s for {n} iters ({n/wall:.0f} it/s)")
    for r in tests:
        print(f"  step {r.get('step')}: image_psnr={r['test_image_psnr']:.2f} "
              f"ssim={r.get('test_image_ssim', float('nan')):.3f} "
              f"test_loss={r['test_loss']:.6f}")
    print("log_dir:", out["log_dir"])


if __name__ == "__main__":
    main()
