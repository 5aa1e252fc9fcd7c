"""Turn an in-progress/killed paper-schedule run into a longsched ledger row.

Time-box tool: the 200k run occupies the chip ~2.5h; the schedules (lr,
window, hyperparam decay) all complete by step 150k, so a run killed
after that answers the pacing question at ~75% of the chip cost. This
evaluates a SUBSET of its checkpoints (every k-th + best + last) and
appends a row in `tpu_longsched.py`'s exact format, flagged
``"partial": true`` with the evaluated step range recorded.

Usage: python scripts/eval_longsched_partial.py <run_dir> [--lca 0.18]
           [--n 200000] [--every 2]
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_contrast_sweep import arm_overrides, eval_ckpt, stability  # noqa: E402
from ledgers import write_json_mirrored  # noqa: E402

OUT = "artifacts/round5/longsched.json"


def main():
    argv = sys.argv[1:]
    run_dir = argv[0]
    lca, n, every = "0.18", 200000, 2
    argv = argv[1:]
    while argv:
        if argv[0] == "--lca":
            lca = argv[1]
        elif argv[0] == "--n":
            n = int(argv[1])
        elif argv[0] == "--every":
            every = int(argv[1])
        else:
            raise SystemExit(f"unknown arg {argv[0]}")
        argv = argv[2:]

    overrides = arm_overrides(lca)
    ckpts = sorted(
        glob.glob(os.path.join(run_dir, "checkpoint-[0-9]*")),
        key=lambda p: int(p.rsplit("-", 1)[1]),
    )
    # every k-th checkpoint, but always keep the last trained one
    keep = ckpts[::every]
    if ckpts and ckpts[-1] not in keep:
        keep.append(ckpts[-1])
    best = os.path.join(run_dir, "checkpoint-best")
    if os.path.isdir(best):
        keep.append(best)

    evals = []
    for c in keep:
        e = eval_ckpt(n, overrides, c, write_images=c.endswith("-best"))
        if e:
            print(json.dumps(e), flush=True)
            evals.append(e)

    steps = [e["step"] for e in evals if e.get("step") is not None]
    row = {
        "synth_lca_val": lca,
        "contrast_ratio_vs_tissue": round(float(lca) / 0.18, 2),
        "n_iters": n,
        "log_dir": run_dir,
        "wall_sec": None,
        "partial": True,
        "evaluated_steps": [min(steps), max(steps)] if steps else [],
        "evals": evals,
        "stability": stability(evals),
        "headline_best": next(
            (e for e in evals if e["ckpt"] == "checkpoint-best"), None),
    }
    results = []
    if os.path.isfile(OUT):
        results = json.load(open(OUT))
    results.append(row)
    write_json_mirrored(results, OUT)
    s = row["stability"]
    print(f"lca={lca} n={n} (partial): peak={s.get('peak_psnr')}@"
          f"{s.get('peak_step')} final={s.get('final_psnr')} "
          f"corr(peak/final)={s.get('peak_dyn_corr')}/{s.get('final_dyn_corr')}")
    print(f"-> {OUT}")


if __name__ == "__main__":
    main()
