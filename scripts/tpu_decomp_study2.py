"""Dense-checkpoint early-phase decomposition study (round 3, stage 2).

Stage 1 (``tpu_decomp_study.py``) showed every weight configuration fails
to separate at the checkpoints it saved (step >= 5000), while the IN-LOOP
selection-view trajectory peaks at dyn_corr ~0.5 around step 1000 with
image PSNR ~13 dB — before the long-run collapse. Two open questions:

  1. Is the early transient a REAL decomposition over all 40 held-out
     views, or a selection-view artifact? (control arm, dense checkpoints,
     40-view eval on EVERY checkpoint)
  2. Does engineering the operating point hold the separation? The
     trajectory-level A/B (artifacts/ab_round3) proved the ACTUAL reference
     trainer fails identically on this data, which licenses data-side
     engineering: clinically, contrast-filled coronaries are the brightest
     structure in an angiogram by a wide margin, so the high-contrast arms
     raise vessel attenuation / radius / motion amplitude (SYNTH-HC).

Every arm saves checkpoints every 500 steps and runs the full 40-view eval
on each; ``--best_metric separated_psnr`` exercises the separation-aware
checkpoint selection. Datasets are pre-built in CPU subprocesses (the
projector jit would otherwise pay a remote TPU compile per new dataset).

Usage: python scripts/tpu_decomp_study2.py [n_iters=3000] [--arms a,b,...]
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

HC_DATA = {
    "data_name": "SYNTH-HC",
    "synth_lca_val": "2.4",
    "synth_vessel_radius": "0.065",
    "synth_motion_scale": "1.5",
}

FOV_HULL = {
    "data_name": "SYNTH-FOV",
    "synth_vessel_extent": "0.22",
    "synth_rib_scale": "0.35",
    "synth_smooth_sigma": "1.5",
    "use_motion_hull": "true",
}

ARMS = {
    # shipped weights on the original phantom: adjudicates the early
    # transient over all 40 views
    "control_dense": {},
    # high-contrast phantom, shipped weights
    "hc": dict(HC_DATA),
    # high-contrast + active variance weighting (pixel-loss weights in
    # [1, 5] instead of [1, 2])
    "hc_w4": dict(HC_DATA, weighted_loss_max="4"),
    # high-contrast + EARLY separation pressure, decaying (stage-1 ramps
    # peaked late and destroyed the image; the separation window is early)
    "hc_early": dict(
        HC_DATA,
        dynamic_entro_weight_start="1e-5",
        dynamic_entro_weight_end="1e-7",
        favor_s_weight_start="1e-6",
        favor_s_weight_end="1e-8",
        favor_s_weight_delay_steps="0",
    ),
    # --- batch 2 (n=6000): stage-2 results showed (a) the compressed
    # schedule with occlusion at full strength steadily IMPROVES 40-view
    # dyn metrics (control: corr 0.23->0.24, dyn_psnr 1.8->2.7 and still
    # rising at cutoff), (b) high contrast helps only the near-training
    # views — the missing prior for cross-view transfer is DEPTH
    # COMPACTNESS of the dynamic field = real dynamic entropy.
    "entro6k": {
        "dynamic_entro_weight_start": "1e-6",
        "dynamic_entro_weight_end": "1e-5",
        "save_every": "1000",
    },
    "entro_occl6k": {
        "dynamic_entro_weight_start": "1e-6",
        "dynamic_entro_weight_end": "1e-5",
        "occl_weight_end": "1e-3",
        "save_every": "1000",
    },
    "hc_entro6k": dict(
        HC_DATA,
        dynamic_entro_weight_start="1e-6",
        dynamic_entro_weight_end="1e-5",
        save_every="1000",
    ),
    "w4_entro6k": {
        "weighted_loss_max": "4",
        "dynamic_entro_weight_start": "1e-6",
        "dynamic_entro_weight_end": "1e-5",
        "save_every": "1000",
    },
    "vs75_entro6k": {
        "var_sample_perc": "75",
        "dynamic_entro_weight_start": "1e-6",
        "dynamic_entro_weight_end": "1e-5",
        "save_every": "1000",
    },
    # --- batch 3: front-only occlusion (the mechanistic fix — the
    # reference's use_back=False occlusion degenerates to a FULL-RAY L1
    # that taxes the vessel's mid-ray dynamic mass; --occl_front_only
    # applies the documented near-camera intent instead, see
    # ops/losses.py::occlusion_loss)
    "front": {"occl_front_only": "true"},
    "hc_front": dict(HC_DATA, occl_front_only="true"),
    "front_w4": {"occl_front_only": "true", "weighted_loss_max": "4"},
    # gentle depth-compactness on top (1e-5 entropy collapses the image;
    # 1e-7 is two orders below that)
    "front_entro7": {
        "occl_front_only": "true",
        "dynamic_entro_weight_start": "1e-8",
        "dynamic_entro_weight_end": "1e-7",
    },
    # --- batch 4: softened-background phantom (SYNTH-EZ). The thin rib
    # arcs are the high-frequency background structure that caps 4-view
    # image quality (~14 dB); background misfit noise then drowns the
    # dynamic signal everywhere. rib_scale 0.35 + heavier smoothing makes
    # the background 4-view-representable so the variance-weighted pixel
    # residual concentrates on the moving vessel.
    "ez": {
        "data_name": "SYNTH-EZ",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
    },
    "ez_entro": {
        "data_name": "SYNTH-EZ",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "dynamic_entro_weight_start": "1e-6",
        "dynamic_entro_weight_end": "1e-5",
    },
    "ez_hc": {
        "data_name": "SYNTH-EZHC",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": "2.4",
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
    },
    # pure depth-compactness: entro_use_weighting=false drops the
    # variance-mask OR, so the entropy acts ONLY on rays already carrying
    # dynamic mass (ssum >= entro_mask_thre) — the empty-ray 1/clip(sum)
    # gradient chaos (BENCH.md round-2 NaN forensics) never engages and
    # the image should survive real entropy weights
    "ez_entro_nw": {
        "data_name": "SYNTH-EZ",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "dynamic_entro_weight_start": "1e-6",
        "dynamic_entro_weight_end": "1e-5",
        "entro_use_weighting": "false",
    },
    "ezhc_entro_nw": {
        "data_name": "SYNTH-EZHC",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": "2.4",
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
        "dynamic_entro_weight_start": "1e-6",
        "dynamic_entro_weight_end": "1e-5",
        "entro_use_weighting": "false",
    },
    # --- batch 5: motion-hull prior (ops/hull.py). Batch 4's verdict:
    # softened background fixes DETECTION (±40° views corr 0.6-0.7) but
    # not 3-D PLACEMENT (lateral views corr < 0) — the dynamic mass sits
    # at the wrong depth. The hull space-carves allowed dynamic territory
    # from the 4 training views' variance maps: dynamic density can only
    # live where EVERY training view sees motion, which pins depth by
    # construction.
    "hull": {"use_motion_hull": "true"},
    "ez_hull": {
        "data_name": "SYNTH-EZ",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "use_motion_hull": "true",
    },
    "ezhc_hull": {
        "data_name": "SYNTH-EZHC",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": "2.4",
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
        "use_motion_hull": "true",
    },
    # hull + front-only occlusion (batch 3 showed front-only is
    # image-preserving; with placement pinned the full-ray tax is moot)
    "ez_hull_front": {
        "data_name": "SYNTH-EZ",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "use_motion_hull": "true",
        "occl_front_only": "true",
    },
    # --- batch 6: in-frustum vessel (SYNTH-FOV). Round-3 FOV forensics
    # (data/phantom.py::_vessel_centerline docstring): at extent 1.0 the
    # detector cone images only the central fraction of the vessel and the
    # (60,-30) training view sees NO vessel (max artery line integral
    # 3e-4) — every prior batch was fighting a geometrically ill-posed
    # benchmark. extent 0.22 puts the full moving vessel inside every
    # view's frustum (validated: all 8 grid + eval views see it across
    # 20-28% of pixels with visible motion).
    "fov": {
        "data_name": "SYNTH-FOV",
        "synth_vessel_extent": "0.22",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
    },
    "fov_hull": {
        "data_name": "SYNTH-FOV",
        "synth_vessel_extent": "0.22",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "use_motion_hull": "true",
    },
    # NB: the batch-6 "fov_hc_hull" spec lives in the batch-8 section
    # below (same config + save_every=500) — a duplicate dict key here
    # would silently shadow it.
    # original (hard) background + in-frustum vessel: attributes gains
    # between background softening and vessel geometry
    "fov_hard": {
        "data_name": "SYNTH-FOVHARD",
        "synth_vessel_extent": "0.22",
    },
    "fov_hard_hull": {
        "data_name": "SYNTH-FOVHARD",
        "synth_vessel_extent": "0.22",
        "use_motion_hull": "true",
    },
    # --- batch 7: frequency-window caps. Batch-6 forensics (metrics.jsonl
    # of the fov_hull run): ALL regularizer weights are ~0 through the
    # collapse; what moves is train_static_windowed 1.7->9 while train
    # PSNR climbs 36->57 dB and held-out image PSNR falls 17->6.5 — pure
    # 4-view memorization as the encoding unlocks. Cap the pointer
    # (--*_pos_enc_window_max) at the band count 4 views can constrain.
    "fov_hull_w3": dict(
        FOV_HULL, static_pos_enc_window_max="3", save_every="1000"
    ),
    "fov_hull_w4": dict(
        FOV_HULL, static_pos_enc_window_max="4", save_every="1000"
    ),
    "fov_hull_w5": dict(
        FOV_HULL, static_pos_enc_window_max="5", save_every="1000"
    ),
    # temp field capped too: it is hull-gated but still composites into
    # held-out renders
    "fov_hull_w4_t4": dict(
        FOV_HULL,
        static_pos_enc_window_max="4",
        temp_pos_enc_window_max="4",
        save_every="1000",
    ),
    # high-contrast arm (crashed mid-batch-6 on a TPU worker fault) + cap
    "fov_hc_hull_w4": {
        "data_name": "SYNTH-FOVHC",
        "synth_vessel_extent": "0.22",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": "2.4",
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
        "use_motion_hull": "true",
        "static_pos_enc_window_max": "4",
        "save_every": "1000",
    },
    # --- batch 8: sub-pixel ray jitter. Batch-7 adjudicated the caps:
    # w4 collapses identically to uncapped (trigger fires at ptr 3.7 < 4)
    # and even w3 — frozen at the last-healthy 3 bands — slides 17.3 ->
    # 8.2, because free_windowed prepends RAW COORDS and the MLP memorizes
    # exact training rays at any band count. Depth stratification only
    # jitters along rays; --ray_jitter_perc adds the lateral axis
    # (pixel-cone supervision). Jitter arms share one compile per jitter
    # value (data is not part of the graph).
    "fov_hull_jit": dict(FOV_HULL, ray_jitter_perc="1.0", save_every="500"),
    "fov_hc_hull_jit": {
        "data_name": "SYNTH-FOVHC",
        "synth_vessel_extent": "0.22",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": "2.4",
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
        "use_motion_hull": "true",
        "ray_jitter_perc": "1.0",
        "save_every": "500",
    },
    # wider-than-pixel cone: stronger smoothing if 1-pixel is not enough
    "fov_hull_jit2": dict(
        FOV_HULL, ray_jitter_perc="2.0", save_every="500"
    ),
    # high contrast WITHOUT jitter: batch-6's crashed arm, the image-
    # quality lever on its own (peaked 20.0 dB at step 1000 pre-crash)
    "fov_hc_hull": {
        "data_name": "SYNTH-FOVHC",
        "synth_vessel_extent": "0.22",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": "2.4",
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
        "use_motion_hull": "true",
        "save_every": "500",
    },
    # --- batch 9: two-timescale freeze (collapse forensics: the static
    # field peaks at ~step 750 then memorizes globally while the dynamic
    # field improves monotonically — freeze static at its peak, keep
    # training dynamic). Freeze rides the traced schedule, so these arms
    # share ONE compile.
    "fov_hull_jit_fz500": dict(
        FOV_HULL, ray_jitter_perc="1.0", static_freeze_step="500",
        save_every="500",
    ),
    "fov_hull_jit_fz750": dict(
        FOV_HULL, ray_jitter_perc="1.0", static_freeze_step="750",
        save_every="500",
    ),
    "fov_hull_jit_fz1000": dict(
        FOV_HULL, ray_jitter_perc="1.0", static_freeze_step="1000",
        save_every="500",
    ),
    # freeze stacked on the batch-8 winner: its 40-view SSIM peaks at
    # checkpoint-1000 (0.938) then slides to 0.88 while dyn_psnr keeps
    # climbing to 27 — freezing static at the SSIM peak should hold both
    "fov_hc_hull_jit_fz1000": {
        "data_name": "SYNTH-FOVHC",
        "synth_vessel_extent": "0.22",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": "2.4",
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
        "use_motion_hull": "true",
        "ray_jitter_perc": "1.0",
        "static_freeze_step": "1000",
        "save_every": "500",
    },
    "fov_hc_hull_jit_fz1500": {
        "data_name": "SYNTH-FOVHC",
        "synth_vessel_extent": "0.22",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": "2.4",
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
        "use_motion_hull": "true",
        "ray_jitter_perc": "1.0",
        "static_freeze_step": "1500",
        "save_every": "500",
    },
    # the batch-8 winner (stable, monotone 22.4 dB at 6k and rising) at a
    # longer horizon — run with n=20000
    "fov_hc_hull_jit_long": {
        "data_name": "SYNTH-FOVHC",
        "synth_vessel_extent": "0.22",
        "synth_rib_scale": "0.35",
        "synth_smooth_sigma": "1.5",
        "synth_lca_val": "2.4",
        "synth_vessel_radius": "0.065",
        "synth_motion_scale": "1.5",
        "use_motion_hull": "true",
        "ray_jitter_perc": "1.0",
        "save_every": "1000",
        "display_every": "500",
        "early_stop_patience": "10",
    },
}

DATA_KEYS = (
    "data_name", "synth_lca_val", "synth_vessel_radius", "synth_motion_scale",
    "synth_rib_scale", "synth_smooth_sigma", "synth_vessel_extent",
)


def base_args(n: int, overrides: dict):
    argv = [
        "--config", "configs/composite.txt",
        "--data_name", "SYNTH",
        "--data_size", "200",
        "--synth_vol_size", "96",
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
    """Build the arm's dataset in a CPU subprocess (fast projector jit).

    Skips the build when the artifact contract is already on disk — the
    phantom is deterministic, so same data args => identical artifacts."""
    from nerfca_tpu.data.dataset import dataset_paths

    args = base_args(n, overrides)
    paths = dataset_paths(args, root="data")
    if all(
        os.path.isfile(p)
        for p in (paths.train, paths.test, paths.evaluate, paths.general)
    ):
        print(f"dataset ready: {paths.folder}", flush=True)
        return
    argv = [
        sys.executable, "-m", "nerfca_tpu.train.run_composite",
        "--config", "configs/composite.txt",
        "--data_name", "SYNTH", "--data_size", "200",
        "--synth_vol_size", "96", "--data_root", "data",
        "--use_wandb", "false",
        "--only_prepare_data", "true", "--platform", "cpu",
    ]
    for k, v in overrides.items():
        if k in DATA_KEYS:
            argv += [f"--{k}", v]
    subprocess.run(argv, check=True)


def eval_ckpt(args_n, overrides, ckpt: str, write_images: bool = False) -> dict:
    eargs = base_args(args_n, overrides)
    eargs.resume_from = ckpt
    try:
        scores = run_eval.evaluate_checkpoint(eargs, write_images=write_images)
    except Exception as e:  # keep the study going
        print(f"eval of {ckpt} failed: {e}")
        return {}
    return {
        "ckpt": os.path.basename(ckpt),
        "step": scores.get("step"),
        "mean_psnr": scores.get("mean_psnr"),
        "mean_ssim": scores.get("mean_ssim"),
        "mean_dyn_psnr": scores.get("mean_dyn_psnr"),
        "mean_dyn_corr": scores.get("mean_dyn_corr"),
    }


def main():
    n = 3000
    names = list(ARMS)
    argv = sys.argv[1:]
    if argv and argv[0].isdigit():
        n = int(argv[0])
        argv = argv[1:]
    if argv and argv[0] == "--arms":
        names = argv[1].split(",")

    # merge with prior batches at the same n (the ledger used to be
    # clobbered per invocation; arm rows are keyed by name)
    out_path = f"cases/SYNTH/decomp_study2-{n}.json"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    results = []
    if os.path.isfile(out_path):
        results = [
            r for r in json.load(open(out_path)) if r["name"] not in names
        ]
    for name in names:
        overrides = ARMS[name]
        print(f"\n=== arm {name}: {overrides} ===", flush=True)
        prepare_dataset_cpu(n, overrides)
        args = base_args(n, overrides)
        t0 = time.time()
        out = train_composite(args)
        wall = time.time() - t0
        log_dir = out["log_dir"]
        records = [
            json.loads(l)
            for l in open(os.path.join(log_dir, "metrics.jsonl"))
        ]
        traj = [
            (r.get("step"), round(r["test_dyn_corr"], 3),
             round(r.get("test_image_psnr", float("nan")), 2))
            for r in records if "test_dyn_corr" in r
        ]
        ckpts = sorted(
            glob.glob(os.path.join(log_dir, "checkpoint-[0-9]*")),
            key=lambda p: int(p.rsplit("-", 1)[1]),
        )
        ckpts.append(os.path.join(log_dir, "checkpoint-best"))
        # panels only for checkpoint-best (the 160 PNG writes per eval
        # dominate the study's eval wall time)
        evals = [
            eval_ckpt(n, overrides, c, write_images=c.endswith("-best"))
            for c in ckpts
        ]
        row = {
            "name": name,
            "overrides": overrides,
            "log_dir": log_dir,
            "wall_sec": round(wall, 1),
            "trajectory(step,dyn_corr,img_psnr)": traj,
            "evals": [e for e in evals if e],
        }
        results.append(row)
        print(json.dumps(row), flush=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    print("\n=== summary (40-view means per checkpoint) ===")
    for r in results:
        for ev in r.get("evals", []):
            print(
                f"{r['name']:16s} {ev['ckpt']:18s} "
                f"psnr={ev['mean_psnr']:.2f} "
                f"dyn_corr={ev.get('mean_dyn_corr', float('nan')):.3f} "
                f"dyn_psnr={ev.get('mean_dyn_psnr', float('nan')):.2f}"
            )


if __name__ == "__main__":
    main()
