"""Backfill the 7-point contrast curve from already-trained checkpoints
(VERDICT r4 item 4 + weak #6: the round-4 sweep trained all arms but the
committed ledger recorded only the 0.18 point).

Scans ``cases/SYNTH-FOVC*/runs/*``, rebuilds each run's exact eval args
from its persisted ``config.json`` (no re-guessing of overrides), scores
EVERY checkpoint on the 40-view held-out set, and writes ONE ledger:
``artifacts/round5/contrast_curve.json`` with per-run trajectories and a
contrast -> (peak/final psnr, peak/final dyn_corr, collapse step) table.

Resume-safe: already-scored (run, ckpt) pairs are skipped, the ledger is
rewritten after every checkpoint. All runs share one compiled render
(identical shapes), so the whole backfill costs ONE TPU compile.

Usage: python scripts/backfill_contrast_evals.py [--cpu] [--glob PATTERN]
"""
import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = "artifacts/round5/contrast_curve.json"

# config keys that distinguish round-4/5 repair arms (ledger labels)
ARM_KEYS = (
    "static_freeze_step", "weighted_loss_max", "hull_static_l1_weight_end",
    "static_pos_enc_window_decay_steps", "ray_jitter_perc",
)


def run_args(run_dir):
    cfg = json.load(open(os.path.join(run_dir, "config.json")))
    return argparse.Namespace(**cfg)


def arm_label(cfg: dict) -> str:
    """Human tag for non-default repair overrides, e.g. 'freeze750+varmax'."""
    bits = []
    if cfg.get("static_freeze_step"):
        bits.append(f"freeze{cfg['static_freeze_step']}")
    if float(cfg.get("weighted_loss_max", 1.0) or 1.0) > 1.0:
        bits.append(f"varmax{cfg['weighted_loss_max']:g}")
    if float(cfg.get("hull_static_l1_weight_end", 0.0) or 0.0) > 0.0:
        bits.append("hl1")
    n = cfg.get("n_iters", 0)
    win = cfg.get("static_pos_enc_window_decay_steps", 0)
    if n and win and win >= n:
        bits.append("longwin")
    return "+".join(bits) or "base"


def stability(rows: list) -> dict:
    rows = [e for e in rows if e and e.get("ckpt") != "checkpoint-best"
            and e.get("mean_psnr") is not None]
    if not rows:
        return {}
    rows = sorted(rows, key=lambda e: e["step"])
    best = max(rows, key=lambda e: e["mean_psnr"])
    final = rows[-1]
    # collapse step: first checkpoint where dyn_corr falls below 0.5 after
    # having been above it (None = never separated or never collapsed)
    collapse = None
    seen_sep = False
    for e in rows:
        c = e.get("mean_dyn_corr")
        if c is None:
            continue
        if c >= 0.5:
            seen_sep = True
        elif seen_sep and collapse is None:
            collapse = e["step"]
    return {
        "peak_psnr": best["mean_psnr"],
        "peak_step": best["step"],
        "peak_dyn_corr": best.get("mean_dyn_corr"),
        "final_psnr": final["mean_psnr"],
        "final_step": final["step"],
        "final_dyn_corr": final.get("mean_dyn_corr"),
        "collapse_step": collapse,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--glob", default="cases/SYNTH-FOVC*/runs/*")
    ap.add_argument("--out", default=OUT)
    opts = ap.parse_args()

    if opts.cpu:
        from nerfca_tpu.train.config import apply_platform

        apply_platform("cpu")

    from nerfca_tpu.train import run_eval

    runs = sorted(d for d in glob.glob(opts.glob) if os.path.isdir(d))
    os.makedirs(os.path.dirname(opts.out), exist_ok=True)
    ledger = {}
    if os.path.isfile(opts.out):
        ledger = json.load(open(opts.out)).get("runs", {})

    for run in runs:
        if not os.path.isfile(os.path.join(run, "config.json")):
            print(f"skip (no config.json): {run}")
            continue
        args = run_args(run)
        cfg = vars(args)
        entry = ledger.setdefault(run, {
            "synth_lca_val": cfg.get("synth_lca_val"),
            "arm": arm_label(cfg),
            "n_iters": cfg.get("n_iters"),
            "evals": [],
        })
        done = {e["ckpt"] for e in entry["evals"]}
        ckpts = sorted(
            glob.glob(os.path.join(run, "checkpoint-[0-9]*")),
            key=lambda p: int(p.rsplit("-", 1)[1]),
        )
        todo = [c for c in ckpts if os.path.basename(c) not in done]
        if not todo:
            print(f"done already: {run} ({len(ckpts)} ckpts)")
            continue
        print(f"== {run} lca={entry['synth_lca_val']} arm={entry['arm']}: "
              f"{len(todo)} checkpoints to score", flush=True)
        for ckpt in todo:
            args.resume_from = ckpt
            t0 = time.time()
            try:
                s = run_eval.evaluate_checkpoint(args, write_images=False)
            except Exception as e:
                print(f"  eval FAILED {ckpt}: {e}", flush=True)
                continue
            row = {
                "ckpt": os.path.basename(ckpt),
                "step": s.get("step"),
                "mean_psnr": s.get("mean_psnr"),
                "mean_ssim": s.get("mean_ssim"),
                "mean_dyn_psnr": s.get("mean_dyn_psnr"),
                "mean_dyn_corr": s.get("mean_dyn_corr"),
            }
            entry["evals"].append(row)
            entry["evals"].sort(key=lambda e: e["step"] or 0)
            entry["stability"] = stability(entry["evals"])
            print(f"  {row['ckpt']}: psnr={row['mean_psnr']:.2f} "
                  f"corr={row['mean_dyn_corr']:.3f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            with open(opts.out, "w") as f:
                json.dump({"runs": ledger}, f, indent=1)

    # contrast table over the BASE arms (one best-final run per contrast)
    table = {}
    for run, entry in ledger.items():
        lca = entry.get("synth_lca_val")
        if lca is None or entry.get("arm") != "base" or not entry.get("stability"):
            continue
        key = f"{float(lca):g}"
        if key not in table or (
            entry["stability"]["final_psnr"]
            > table[key]["stability"]["final_psnr"]
        ):
            table[key] = {"run": run, "stability": entry["stability"]}
    with open(opts.out, "w") as f:
        json.dump({"runs": ledger, "contrast_table": table}, f, indent=1)
    print("\n=== contrast -> stability (base arms) ===")
    for k in sorted(table, key=float, reverse=True):
        s = table[k]["stability"]
        print(f"lca={k:>5}: peak={s['peak_psnr']:.2f}@{s['peak_step']} "
              f"final={s['final_psnr']:.2f} corr(peak/final)="
              f"{s['peak_dyn_corr']:.2f}/{s['final_dyn_corr']:.2f} "
              f"collapse@{s['collapse_step']}")
    print(f"-> {opts.out}")


if __name__ == "__main__":
    main()
