"""End-to-end MAGIX-surrogate run: the CCTA pipeline on a clinical-scale
volume (VERDICT r3 item 6).

No real CCTA scan is redistributable (and SimpleITK is absent), so this
drives the pipeline with the HU-space surrogate thorax
(``data/ccta_surrogate.py``): HU->mu conversion, resample-by-anisotropic-
spacing, aorta flattening, and EDT vessel conditioning all execute on
clinically-scaled inputs, then the standard dataset builder projects the
conditioned volumes with the CCTA acquisition preset
(``geometry/cone.py::ccta_geometry`` — DSD 2000 / DSO 600, the reference's
MAGIX geometry) and the 4-view quality recipe trains on the result.

Stages (each skipped when its artifacts exist):
  1. generate + preprocess 10 phases -> data/MAGIX-SURR-vols/<p>/*.npy (CPU)
  2. build the projection dataset (CPU subprocess)
  3. train the composite recipe (TPU), eval every checkpoint (40-view set)

Writes ``cases/MAGIX-SURR/surrogate_run.json``.

Usage: python scripts/tpu_ccta_surrogate.py [n_iters=6000] [resume_ckpt]
"""
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_composite
from nerfca_tpu.train import run_eval

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ledgers import write_json_mirrored  # noqa: E402

VOLS = "data/MAGIX-SURR-vols"
OUT = "cases/MAGIX-SURR/surrogate_run.json"


def data_argv():
    return [
        "--data_name", "MAGIX-SURR",
        "--x_ray_type", "rotation",
        "--data_size", "200",
        "--volume_root", VOLS,
        "--data_limited_range", "60",
        "--data_step_size", "120",
        "--data_numb_angles", "4",
        "--data_time_range_start", "0",
        "--data_time_range_end", "10",
        "--selection_view", "0,0",
        "--data_root", "data",
    ]


def build(n: int, resume=None):
    argv = [
        "--config", "configs/composite.txt",
        *data_argv(),
        "--n_iters", str(n),
        # cadence scales with n so a paper-schedule (200k) run keeps ~20
        # checkpoints instead of 400; identical to the old constants at
        # the 6k campaign length
        "--display_every", str(max(250, n // 40)),
        "--save_every", str(max(500, n // 20)),
        "--log_every", str(max(250, n // 200)),
        "--steps_per_chunk", "500" if n >= 10000 else "250",
        "--keep_last_n_checkpoints", "50",
        "--best_metric", "separated_psnr",
        "--lr_decay_steps", str(int(n * 0.75)),
        "--static_pos_enc_window_decay_steps", str(int(n * 0.75)),
        "--temp_pos_enc_window_decay_steps", str(int(n * 0.75)),
        "--hyperparam_decay_steps", str(int(n * 0.5)),
        "--favor_s_weight_delay_steps", str(int(n * 0.2)),
        "--entro_clip_threshold", "1e-6",
        # the round-3 quality recipe's framework ingredients
        "--use_motion_hull", "true",
        "--ray_jitter_perc", "1.0",
        "--use_pallas", "true",
        "--use_fused_loss", "true",
        "--use_wandb", "false",
        "--log_dir_root", "cases",
    ]
    if resume:
        argv += ["--resume_from", resume]
    return parse_args(argv)


def stage1_volumes():
    if all(
        os.path.isfile(os.path.join(VOLS, str(p), f))
        for p in range(10)
        for f in ("full_volume_tigre.npy", "dyn_volume_tigre.npy")
    ):
        print(f"volumes ready: {VOLS}", flush=True)
        return
    from nerfca_tpu.data.ccta_surrogate import write_surrogate_case

    write_surrogate_case(VOLS, phases=10)


def stage2_dataset(n: int):
    from nerfca_tpu.data.dataset import dataset_paths

    args = build(n)
    paths = dataset_paths(args, root="data")
    if all(
        os.path.isfile(p)
        for p in (paths.train, paths.test, paths.evaluate, paths.general)
    ):
        print(f"dataset ready: {paths.folder}", flush=True)
        return
    subprocess.run(
        [
            sys.executable, "-m", "nerfca_tpu.train.run_composite",
            "--config", "configs/composite.txt",
            *data_argv(),
            "--use_wandb", "false",
            "--only_prepare_data", "true", "--platform", "cpu",
        ],
        check=True,
    )


def eval_ckpt(n: int, ckpt: str, write_images: bool = False) -> dict:
    eargs = build(n)
    eargs.resume_from = ckpt
    print(f"evaluating {ckpt} ...", flush=True)
    try:
        scores = run_eval.evaluate_checkpoint(eargs, write_images=write_images)
    except Exception as e:
        print(f"eval of {ckpt} failed: {e}")
        return {}
    return {
        "ckpt": os.path.basename(ckpt),
        "step": scores.get("step"),
        "mean_psnr": scores.get("mean_psnr"),
        "mean_ssim": scores.get("mean_ssim"),
        "mean_dyn_psnr": scores.get("mean_dyn_psnr"),
        "mean_dyn_psnr_masked": scores.get("mean_dyn_psnr_masked"),
        "mean_dyn_corr": scores.get("mean_dyn_corr"),
        "per_view_angle": scores.get("per_view_angle"),
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    resume = sys.argv[2] if len(sys.argv) > 2 else None
    stage1_volumes()
    stage2_dataset(n)

    args = build(n, resume)
    t0 = time.time()
    out = train_composite(args)
    wall = time.time() - t0
    log_dir = out["log_dir"]
    if out.get("diverged_at") is not None:
        # never write a NaN headline as if it were a result (round-4 weak #1)
        row = {
            "status": "DIVERGED",
            "diverged_at": out["diverged_at"],
            "diverged_terms": out.get("diverged_terms"),
            "n_iters": n,
            "log_dir": log_dir,
            "train_wall_s": round(wall, 1),
        }
        out_n = OUT.replace(".json", f"-{n}.json")
        write_json_mirrored(row, out_n, f"magix_surrogate_run-{n}.json")
        # a diverged run is recorded under its own n-tagged file and never
        # clobbers the canonical headline (which may hold a finite result)
        print(f"DIVERGED at step {out['diverged_at']} "
              f"({out.get('diverged_terms')}) -> {out_n}")
        sys.exit(3)

    ckpts = sorted(
        glob.glob(os.path.join(log_dir, "checkpoint-[0-9]*")),
        key=lambda p: int(p.rsplit("-", 1)[1]),
    )
    evals = [eval_ckpt(n, c) for c in ckpts]
    best = eval_ckpt(n, os.path.join(log_dir, "checkpoint-best"),
                     write_images=True)

    row = {
        "pipeline": "surrogate HU volumes -> ccta preprocess -> CCTA-preset "
                    "dataset -> 4-view composite train (hull + jitter, "
                    "selection_view disjoint from eval)",
        "n_iters": n,
        "log_dir": log_dir,
        "train_wall_s": round(wall, 1),
        "headline_checkpoint_best": best,
        "per_checkpoint_40view": [e for e in evals if e],
    }
    write_json_mirrored(row, OUT.replace(".json", f"-{n}.json"),
                        f"magix_surrogate_run-{n}.json")
    write_json_mirrored(row, OUT, "magix_surrogate_run.json")
    print(json.dumps({k: row[k] for k in
                      ("log_dir", "train_wall_s", "headline_checkpoint_best")}),
          flush=True)
    print(f"-> {OUT}")


if __name__ == "__main__":
    main()
