"""Clean-protocol headline run of the 4-view quality recipe (VERDICT r3 #1).

Runs ``configs/synth-4view-best.txt`` VERBATIM — selection_view = (0,0),
disjoint from the 4 clinical test angles x 10 phases that make up the
reported 40-view evaluate.json set — then evaluates EVERY saved checkpoint
over the full 40-view set. Checkpoint-best retention keys on the selection
view only (``--best_metric separated_psnr`` on test frame 0 = the selection
view), so the reported numbers are selected without ever seeing the report
set: the clean protocol the round-3 batch 6-9 studies lacked (their
datasets predated the selection-view-in-dataset-tag fix; BENCH.md §12).

Also records the time-to-quality ledger (VERDICT r3 #8): wall-clock to each
checkpoint (training is chunked at a fixed steps/s, so per-checkpoint wall
= train_wall * step/n_iters + dataset/compile overhead, reported separately)
joined with that checkpoint's 40-view mean PSNR.

Writes ``cases/SYNTH-FOVHC/clean_protocol.json`` (or
``clean_protocol_multisel.json`` with ``--selection``).

``--selection "t1,p1;t2,p2;..."`` switches model selection to the mean
over K dedicated disjoint views (VERDICT r4 item 5: single-view selection
left 2.1 dB on the table vs the oracle peak and inverted at 3-view).

Usage: python scripts/tpu_clean_protocol.py [resume_ckpt] [--selection S]
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

CONFIG = "configs/synth-4view-best.txt"
OUT = "cases/SYNTH-FOVHC/clean_protocol.json"
SELECTION = "0,0"  # overridden by --selection


def build(resume=None):
    argv = [
        "--config", CONFIG,
        "--use_wandb", "false",
        "--data_root", "data",
        "--log_dir_root", "cases",
    ]
    if SELECTION != "0,0":
        argv += [f"--selection_view={SELECTION}"]
    if resume:
        argv += ["--resume_from", resume]
    return parse_args(argv)


def prepare_dataset_cpu():
    """Build the dataset in a CPU subprocess (fast projector jit); the
    dataset tag encodes the selection view, so a stale pre-fix folder can
    never satisfy this run."""
    from nerfca_tpu.data.dataset import dataset_paths

    args = build()
    paths = dataset_paths(args, root="data")
    if all(
        os.path.isfile(p)
        for p in (paths.train, paths.test, paths.evaluate, paths.general)
    ):
        print(f"dataset ready: {paths.folder}", flush=True)
        return
    argv = [
        sys.executable, "-m", "nerfca_tpu.train.run_composite",
        "--config", CONFIG, "--data_root", "data",
        "--use_wandb", "false",
        "--only_prepare_data", "true", "--platform", "cpu",
    ]
    if SELECTION != "0,0":
        argv += [f"--selection_view={SELECTION}"]
    subprocess.run(argv, check=True)


def eval_ckpt(ckpt: str, write_images: bool = False) -> dict:
    eargs = build()
    eargs.resume_from = ckpt
    # flushed progress line keeps the campaign watchdog's log-staleness
    # clock fresh through the long silent eval phase
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
        "per_view_angle": scores.get("per_view_angle"),
    }


def main():
    global OUT, SELECTION
    argv = list(sys.argv[1:])
    if "--selection" in argv:
        i = argv.index("--selection")
        SELECTION = argv[i + 1]
        del argv[i:i + 2]
        OUT = OUT.replace(".json", "_multisel.json")
    resume = argv[0] if argv else None
    prepare_dataset_cpu()
    args = build(resume)
    t0 = time.time()
    out = train_composite(args)
    train_wall = time.time() - t0
    log_dir = out["log_dir"]

    # protocol audit: the run's own config must show the disjoint selection
    cfg = json.load(open(os.path.join(log_dir, "config.json")))
    assert cfg.get("selection_view") == SELECTION, cfg.get("selection_view")

    ckpts = sorted(
        glob.glob(os.path.join(log_dir, "checkpoint-[0-9]*")),
        key=lambda p: int(p.rsplit("-", 1)[1]),
    )
    evals = [eval_ckpt(c) for c in ckpts]
    best = eval_ckpt(os.path.join(log_dir, "checkpoint-best"),
                     write_images=True)

    n_iters = int(cfg["n_iters"])
    steps_per_sec = n_iters / train_wall  # incl. compile + in-loop evals
    time_to = []
    for e in evals:
        if not e:
            continue
        time_to.append({
            "step": e["step"],
            "est_wall_s": round(train_wall * e["step"] / n_iters, 1),
            "mean_psnr": e["mean_psnr"],
            "mean_dyn_corr": e["mean_dyn_corr"],
        })

    row = {
        "config": CONFIG,
        "selection_view": SELECTION,
        "protocol": f"selection_view(s)={SELECTION} disjoint from the "
                    "40-view evaluate.json set; checkpoint-best keyed on "
                    "the selection view(s) only (mean when multiple)",
        "log_dir": log_dir,
        "train_wall_s": round(train_wall, 1),
        "steps_per_sec_incl_overhead": round(steps_per_sec, 1),
        "headline_checkpoint_best": best,
        "per_checkpoint_40view": [e for e in evals if e],
        "time_to_quality": time_to,
    }
    from ledgers import write_json_mirrored
    write_json_mirrored(row, OUT)
    print(json.dumps({k: row[k] for k in
                      ("log_dir", "train_wall_s", "headline_checkpoint_best")}),
          flush=True)
    print(f"-> {OUT}")


if __name__ == "__main__":
    main()
