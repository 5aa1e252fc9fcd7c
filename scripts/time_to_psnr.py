"""Time-to-quality benchmark: wall-clock until the held-out view reaches a
target PSNR (the BASELINE.md second metric, 'paper PSNR on 4-view XCAT
composite in < 30 min on v4-8').

Usage: python scripts/time_to_psnr.py [target_psnr=25] [max_iters=50000]

Runs the flagship composite config on the synthetic dataset, polling the
eval metric at every display interval; prints a JSON summary.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_composite


def main():
    target = float(sys.argv[1]) if len(sys.argv) > 1 else 25.0
    max_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 50000
    args = parse_args([
        "--config", "configs/composite.txt",
        "--data_name", "SYNTH",
        "--data_size", "200",
        "--synth_vol_size", "96",
        "--n_iters", str(max_iters),
        "--display_every", "1000",
        "--save_every", str(max_iters),
        "--log_every", "500",
        "--steps_per_chunk", "100",
        "--lr_decay_steps", str(int(max_iters * 0.75)),
        "--static_pos_enc_window_decay_steps", str(int(max_iters * 0.75)),
        "--temp_pos_enc_window_decay_steps", str(int(max_iters * 0.75)),
        "--hyperparam_decay_steps", str(int(max_iters * 0.5)),
        "--favor_s_weight_delay_steps", str(int(max_iters * 0.2)),
        "--use_pallas", "true",
    ])
    t0 = time.time()
    out = train_composite(args)
    wall = time.time() - t0

    recs = [json.loads(l) for l in open(os.path.join(out["log_dir"], "metrics.jsonl"))]
    tests = [r for r in recs if "test_image_psnr" in r]
    hit = next((r for r in tests if r["test_image_psnr"] >= target), None)
    best = max((r["test_image_psnr"] for r in tests), default=float("nan"))
    print(json.dumps({
        "target_psnr": target,
        "reached": hit is not None,
        "step_at_target": hit["step"] if hit else None,
        # wall time scaled by the fraction of steps needed (evals excluded)
        "est_seconds_to_target": wall * hit["step"] / max_iters if hit else None,
        "best_psnr": best,
        "total_wall_s": wall,
        "log_dir": out["log_dir"],
    }))


if __name__ == "__main__":
    main()
