"""Short real-hardware training run on the synthetic dataset: verifies the
full pipeline trains on TPU and records the PSNR trajectory.

Usage: python scripts/tpu_quality_run.py [n_iters]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_composite


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    args = parse_args([
        "--config", "configs/composite.txt",
        "--data_name", "SYNTH",
        "--data_size", "200",
        "--synth_vol_size", "96",
        "--n_iters", str(n_iters),
        "--display_every", "500",
        "--save_every", str(n_iters),
        "--log_every", "100",
        "--steps_per_chunk", "100",
        "--lr_decay_steps", str(max(1, int(n_iters * 0.75))),
        "--static_pos_enc_window_decay_steps", str(max(1, int(n_iters * 0.75))),
        "--temp_pos_enc_window_decay_steps", str(max(1, int(n_iters * 0.75))),
        "--hyperparam_decay_steps", str(max(1, n_iters // 2)),
        "--favor_s_weight_delay_steps", str(max(1, n_iters // 5)),
        "--use_pallas", "true",
        "--use_fused_loss", "true",
        "--data_root", "data",
        "--log_dir_root", "cases",
    ])
    t0 = time.time()
    out = train_composite(args)
    wall = time.time() - t0
    records = [json.loads(l) for l in open(os.path.join(out["log_dir"], "metrics.jsonl"))]
    tests = [r for r in records if "test_image_psnr" in r]
    print(f"\nwall {wall:.0f}s for {n_iters} iters")
    for r in tests:
        print(f"  step {r.get('step')}: image_psnr={r['test_image_psnr']:.2f} "
              f"ssim={r.get('test_image_ssim', float('nan')):.3f} "
              f"test_loss={r['test_loss']:.5f}")


if __name__ == "__main__":
    main()
