"""2- and 3-view preset capability runs (TPU).

The reference defines 2/3/4-view presets (``general_helpers.py:131-141``);
the 4-view preset is the headline operating point, but the 2/3-view presets
are part of the capability surface. This runs one training per preset at
the round-3 quality operating point (``configs/synth-4view-best.txt``:
SYNTH-FOVHC phantom + motion hull + ray jitter — the base phantom was
shown geometrically ill-posed by the FOV forensics, BENCH.md round 3) and
records the 40-view eval — exercising view selection, dataset build,
training, and eval end-to-end at each preset.

The dataset json naming (reference contract) does not encode numb_angles,
so each preset gets a distinct ``data_step_size`` (> limited_range, unused
by the preset path beyond the range check) to keep distinct artifact names.

Usage: python scripts/tpu_preset_views.py [n_iters=6000]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_composite
from nerfca_tpu.train import run_eval

PRESETS = {3: "130", 2: "140"}  # numb_angles -> distinct data_step_size


def build(n_iters: int, numb: int, step_size: str, resume=None):
    argv = [
        "--config", "configs/synth-4view-best.txt",
        "--data_numb_angles", str(numb),
        "--data_step_size", step_size,
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    results = []
    for numb, step_size in PRESETS.items():
        print(f"\n=== {numb}-view preset ===", flush=True)
        args = build(n, numb, step_size)
        t0 = time.time()
        out = train_composite(args)
        wall = time.time() - t0
        log_dir = out["log_dir"]
        row = {"numb_angles": numb, "log_dir": log_dir, "wall_sec": round(wall, 1)}
        for which in ("checkpoint", "checkpoint-best"):
            ckpt = os.path.join(log_dir, which)
            if not os.path.isdir(ckpt):
                continue
            eargs = build(n, numb, step_size)
            eargs.resume_from = ckpt
            try:
                scores = run_eval.evaluate_checkpoint(eargs)
                row[which] = {
                    "step": scores.get("step"),
                    "mean_psnr": scores.get("mean_psnr"),
                    "mean_ssim": scores.get("mean_ssim"),
                    "mean_dyn_corr": scores.get("mean_dyn_corr"),
                }
            except Exception as e:
                print(f"eval failed: {e}")
        results.append(row)
        print(json.dumps(row), flush=True)
        os.makedirs("cases/SYNTH", exist_ok=True)
        with open("cases/SYNTH/preset_views.json", "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
