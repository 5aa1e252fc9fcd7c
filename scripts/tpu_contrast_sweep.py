"""Vessel-contrast sweep: where does the stable 4-view regime die?
(VERDICT r3 item 2.)

The round-3 headline recipe pins the vessel at ``synth_lca_val = 2.4`` —
13x the phantom's soft-tissue value (0.18), justified clinically
(contrast-filled coronaries are the brightest structure in an angiogram)
but 16x the XCAT pipeline's ``lca_val = 0.15``
(``/root/reference/preprocess/xcat.py:10``), which sits roughly AT its
tissue scale. This sweeps the contrast downward at the otherwise-fixed
recipe (SYNTH-FOV geometry, vessel radius 0.065, motion hull, ray jitter,
clean selection protocol: selection_view (0,0) disjoint from the 40-view
eval set) and records the 40-view (psnr, dyn_corr) trajectory of every
checkpoint — the contrast-vs-(quality, stability) curve.

All arms share ONE train-step compile (contrast is data, not graph).

Usage: python scripts/tpu_contrast_sweep.py [n_iters=6000] [--arms a,b,...]
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

# vessel/soft-tissue ratio: 2.4 -> 13.3x (the shipped recipe, anchor),
# 0.35 -> 1.9x, 0.18 -> 1.0x (vessel iso-intense with tissue — the
# XCAT-like regime where only MOTION distinguishes the coronary)
CONTRASTS = ["2.4", "1.6", "1.2", "0.8", "0.5", "0.35", "0.18"]

DATA_KEYS = (
    "data_name", "synth_lca_val", "synth_vessel_radius", "synth_motion_scale",
    "synth_rib_scale", "synth_smooth_sigma", "synth_vessel_extent",
)


def arm_overrides(lca: str) -> dict:
    tag = lca.replace(".", "p")
    return {
        "data_name": f"SYNTH-FOVC{tag}",
        "synth_vessel_extent": "0.22",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": lca,
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
    }


def base_args(n: int, overrides: dict):
    argv = [
        "--config", "configs/composite.txt",
        "--data_size", "200",
        "--synth_vol_size", "96",
        "--selection_view", "0,0",
        "--n_iters", str(n),
        "--display_every", "250",
        "--save_every", "500",
        "--log_every", "250",
        "--steps_per_chunk", "250",
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
        "--data_root", "data",
        "--log_dir_root", "cases",
    ]
    for k, v in overrides.items():
        argv += [f"--{k}", v]
    return parse_args(argv)


def prepare_dataset_cpu(n: int, overrides: dict) -> None:
    from nerfca_tpu.data.dataset import dataset_paths

    args = base_args(n, overrides)
    paths = dataset_paths(args, root="data")
    lock = os.path.join(paths.folder, ".building")

    def ready() -> bool:
        # the lockfile guards against a concurrent builder's partial files
        # being read as a complete dataset (ADVICE r4 #1)
        return all(
            os.path.isfile(p)
            for p in (paths.train, paths.test, paths.evaluate, paths.general)
        ) and not os.path.exists(lock)

    if ready():
        print(f"dataset ready: {paths.folder}", flush=True)
        return
    # if a concurrent builder (scripts/prep_round5e.sh) holds the lock,
    # WAIT for it rather than racing it: two builders interleaving writes
    # to the same artifact files can crash the one that reads them first.
    # A lock that outlives an hour is treated as stale (crashed/wiped
    # builder) and we take over.
    waited = 0
    while os.path.exists(lock) and waited < 3600:
        if waited % 300 == 0:
            print(f"waiting on concurrent builder: {lock}", flush=True)
        time.sleep(30)
        waited += 30
    if ready():
        print(f"dataset ready (built concurrently): {paths.folder}", flush=True)
        return
    argv = [
        sys.executable, "-m", "nerfca_tpu.train.run_composite",
        "--config", "configs/composite.txt",
        "--data_size", "200", "--synth_vol_size", "96",
        "--selection_view", "0,0",
        "--data_root", "data", "--use_wandb", "false",
        "--only_prepare_data", "true", "--platform", "cpu",
    ]
    for k, v in overrides.items():
        if k in DATA_KEYS:
            argv += [f"--{k}", v]
    os.makedirs(paths.folder, exist_ok=True)
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    try:
        subprocess.run(argv, check=True)
    finally:
        if os.path.exists(lock):
            os.remove(lock)


def eval_ckpt(n, overrides, ckpt, write_images=False) -> dict:
    eargs = base_args(n, overrides)
    eargs.resume_from = ckpt
    # flushed progress line: eval phases run 30-50 min with otherwise
    # silent stdout, and the campaign watchdog stall-kills quiet jobs
    print(f"evaluating {ckpt} ...", flush=True)
    try:
        scores = run_eval.evaluate_checkpoint(eargs, write_images=write_images)
    except Exception as e:
        print(f"eval of {ckpt} failed: {e}", flush=True)
        return {}
    return {
        "ckpt": os.path.basename(ckpt),
        "step": scores.get("step"),
        "mean_psnr": scores.get("mean_psnr"),
        "mean_ssim": scores.get("mean_ssim"),
        "mean_dyn_psnr": scores.get("mean_dyn_psnr"),
        "mean_dyn_psnr_masked": scores.get("mean_dyn_psnr_masked"),
        "mean_dyn_corr": scores.get("mean_dyn_corr"),
    }


def stability(evals: list) -> dict:
    """Peak vs final over the numbered-checkpoint trajectory."""
    rows = [e for e in evals if e and e["ckpt"] != "checkpoint-best"]
    if not rows:
        return {}
    best = max(rows, key=lambda e: e["mean_psnr"])
    final = rows[-1]
    return {
        "peak_psnr": best["mean_psnr"],
        "peak_step": best["step"],
        "final_psnr": final["mean_psnr"],
        "psnr_drop_peak_to_final": round(best["mean_psnr"] - final["mean_psnr"], 2),
        "final_dyn_corr": final.get("mean_dyn_corr"),
        "peak_dyn_corr": best.get("mean_dyn_corr"),
    }


def main():
    n = 6000
    arms = list(CONTRASTS)
    argv = sys.argv[1:]
    if argv and argv[0].replace(".", "").isdigit():
        n = int(float(argv[0]))
        argv = argv[1:]
    if argv and argv[0] == "--arms":
        arms = argv[1].split(",")

    force = False
    if argv and argv[0] == "--force":
        force = True
        argv = argv[1:]

    out_path = f"cases/SYNTH/contrast_sweep-{n}.json"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    results = []
    if os.path.isfile(out_path):
        results = json.load(open(out_path))
        if force:
            results = [r for r in results if r["synth_lca_val"] not in arms]
        else:
            # resume semantics: a killed/retried sweep skips finished arms
            done = {r["synth_lca_val"] for r in results}
            skipped = [a for a in arms if a in done]
            if skipped:
                print(f"resuming: arms {skipped} already recorded", flush=True)
            arms = [a for a in arms if a not in done]
    for lca in arms:
        overrides = arm_overrides(lca)
        print(f"\n=== contrast {lca} ({overrides['data_name']}) ===", flush=True)
        prepare_dataset_cpu(n, overrides)
        args = base_args(n, overrides)
        t0 = time.time()
        out = train_composite(args)
        wall = time.time() - t0
        log_dir = out["log_dir"]
        ckpts = sorted(
            glob.glob(os.path.join(log_dir, "checkpoint-[0-9]*")),
            key=lambda p: int(p.rsplit("-", 1)[1]),
        )
        ckpts.append(os.path.join(log_dir, "checkpoint-best"))
        evals = [
            eval_ckpt(n, overrides, c, write_images=c.endswith("-best"))
            for c in ckpts
        ]
        row = {
            "synth_lca_val": lca,
            "contrast_ratio_vs_tissue": round(float(lca) / 0.18, 2),
            "log_dir": log_dir,
            "wall_sec": round(wall, 1),
            "diverged_at": out.get("diverged_at"),
            "stability": stability(evals),
            "evals": [e for e in evals if e],
        }
        results.append(row)
        print(json.dumps({k: row[k] for k in
                          ("synth_lca_val", "stability")}), flush=True)
        from ledgers import write_json_mirrored
        write_json_mirrored(results, out_path)

    print("\n=== contrast-vs-(quality, stability) ===")
    for r in sorted(results, key=lambda r: -float(r["synth_lca_val"])):
        s = r.get("stability", {})
        print(
            f"lca={r['synth_lca_val']:>5} ({r['contrast_ratio_vs_tissue']:>5}x) "
            f"peak={s.get('peak_psnr', float('nan')):.2f}@{s.get('peak_step')} "
            f"final={s.get('final_psnr', float('nan')):.2f} "
            f"drop={s.get('psnr_drop_peak_to_final')} "
            f"corr(peak/final)={s.get('peak_dyn_corr')}/{s.get('final_dyn_corr')}"
        )


if __name__ == "__main__":
    main()
