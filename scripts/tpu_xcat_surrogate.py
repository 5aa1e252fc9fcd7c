"""End-to-end XCAT run via the REAL driver contract (VERDICT r3 "partial").

The proprietary ``dxcat1_bin`` is absent, so ``data/xcat.py`` — the
reference driver contract (``preprocess/xcat.py``): phases.json registry,
``.samp.par`` override, subprocess per {volume, noarteries}, raw
512x512x401 f32 bin load, ``|full - noarteries|`` artery extraction, LCA
crop + pin to ``lca_val = 0.15`` — had never executed at full scale. This
installs the surrogate generator as ``dxcat1_bin``
(``scripts/dxcat_surrogate_bin.py``) and runs EVERY stage of the real
pipeline at the real dimensions, then builds the projection dataset with
the XCAT acquisition preset (DSD 2500 / DSO 450 / offOrigin [10,-25,25])
and trains the 4-view recipe.

Note the contrast regime this lands in: the reference pins the LCA at
0.15 against a 0.18-0.20 background — a ~1.0x-tissue (slightly negative
contrast) vessel distinguishable mainly by MOTION. Cross-reference the
round-4 contrast sweep's low arms on SYNTH-FOV.

Stages (skipped when artifacts exist):
  1. install surrogate binary + par templates, run prepare_and_run_xcat
     for 10 phases -> data/XCAT-SURR/<id>/*.npy (CPU, ~8 GB of bins)
  2. build the projection dataset (CPU subprocess)
  3. train + eval every checkpoint (TPU)

Writes ``cases/XCAT-SURR/surrogate_run.json``.

Usage: python scripts/tpu_xcat_surrogate.py [n_iters=6000] [resume_ckpt]
"""
import glob
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerfca_tpu.train.config import parse_args
from nerfca_tpu.train.trainer import train_composite
from nerfca_tpu.train import run_eval

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ledgers import write_json_mirrored  # noqa: E402

XCAT_PATH = "data/XCAT-SURR"
OUT = "cases/XCAT-SURR/surrogate_run.json"

PAR_TEMPLATE = (
    "0.0\thrt_start_phase_index (cardiac phase at sim start)\n"
    "0.0\tresp_start_phase_index (respiratory phase at sim start)\n"
    "1\tout_frames (number of output frames)\n"
)


def data_argv():
    return [
        "--data_name", "XCAT-SURR",
        "--x_ray_type", "rotation",
        "--data_size", "200",
        "--volume_root", XCAT_PATH,
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


def stage1_xcat_pipeline():
    from nerfca_tpu.data.xcat import prepare_and_run_xcat

    os.makedirs(XCAT_PATH, exist_ok=True)
    # install the surrogate binary under the name the driver invokes
    bin_dst = os.path.join(XCAT_PATH, "dxcat1_bin")
    if not os.path.isfile(bin_dst):
        shutil.copy("scripts/dxcat_surrogate_bin.py", bin_dst)
        os.chmod(bin_dst, 0o755)
    for name in ("volume", "noarteries"):
        par = os.path.join(XCAT_PATH, f"{name}.samp.par")
        if not os.path.isfile(par):
            with open(par, "w") as f:
                f.write(PAR_TEMPLATE)

    env_repo = os.path.abspath(".")
    os.environ.setdefault("NERFCA_REPO", env_repo)
    # absolute path: run_xcat_binary resolves the candidate relative to the
    # child's cwd (= xcat_path), so a relative repo path would double up
    xcat_abs = os.path.abspath(XCAT_PATH)
    for p in range(10):
        run_dir = os.path.join(XCAT_PATH, str(p))
        if os.path.isfile(os.path.join(run_dir, "dyn_volume_tigre.npy")):
            print(f"phase {p} ready", flush=True)
            continue
        t0 = time.time()
        obj = prepare_and_run_xcat(p / 10.0, 0.0, xcat_abs)
        print(
            f"phase {p}: id={obj['id']} bbox_center="
            f"{[round(v, 1) for v in obj['bounding_box_center']]} "
            f"({time.time() - t0:.0f}s)",
            flush=True,
        )
        # the raw bins are 420 MB each and fully consumed into the npy
        # artifacts; drop them to keep the footprint bounded
        for name in ("volume", "noarteries"):
            b = os.path.join(run_dir, f"{name}_atn_1.bin")
            if os.path.isfile(b):
                os.remove(b)


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
    stage1_xcat_pipeline()
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
        write_json_mirrored(row, out_n, f"xcat_surrogate_run-{n}.json")
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
        "pipeline": "surrogate dxcat1_bin -> REAL xcat driver contract "
                    "(par override, subprocess, bin load, LCA extract+pin "
                    "0.15) -> XCAT-preset dataset -> 4-view composite "
                    "train (hull + jitter, clean selection protocol)",
        "contrast_note": "lca pinned 0.15 vs heart 0.20 / tissue 0.18 — "
                         "the motion-only (~1x tissue) regime",
        "n_iters": n,
        "log_dir": log_dir,
        "train_wall_s": round(wall, 1),
        "headline_checkpoint_best": best,
        "per_checkpoint_40view": [e for e in evals if e],
    }
    write_json_mirrored(row, OUT.replace(".json", f"-{n}.json"),
                        f"xcat_surrogate_run-{n}.json")
    write_json_mirrored(row, OUT, "xcat_surrogate_run.json")
    print(json.dumps({k: row[k] for k in
                      ("log_dir", "train_wall_s", "headline_checkpoint_best")}),
          flush=True)
    print(f"-> {OUT}")


if __name__ == "__main__":
    main()
