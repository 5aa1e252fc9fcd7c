"""Paper-schedule (200k-iteration) runs at a chosen vessel contrast.

Every low-contrast experiment so far compressed the reference's schedule
(200,001 iterations, window/lr decay over 150k —
``/root/reference/train/composite.txt:28,34-36``) into 6,000 steps: the
static field's encoding window opens ~33x faster than the paper's pacing
while the separation regularizers get ~33x less time at full strength —
a plausible driver of the post-peak collapse the 6k runs show at 1.0x
vessel contrast. One full-schedule run costs only ~16 min of chip time at
~219k rays/s, so the decisive question — does 1.0x-contrast separation
hold at the REFERENCE's own pacing? — is cheap to answer directly.

Reuses the contrast-sweep recipe verbatim (hull + jitter + clean
selection-view protocol, ``scripts/tpu_contrast_sweep.py::base_args``) so
the ONLY changed variable is the schedule length; checkpoints are
40-view-evaluated like every other campaign ledger.

Usage: python scripts/tpu_longsched.py [n=200000] [--lca 0.18]
           [--resume <ckpt_dir>] [--extra k=v ...]
Ledger: artifacts/round5/longsched.json (appends; arms keyed (lca, n))
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tpu_contrast_sweep import (  # noqa: E402
    arm_overrides, base_args, prepare_dataset_cpu, eval_ckpt, stability,
)
from nerfca_tpu.train.trainer import train_composite  # noqa: E402

OUT = "artifacts/round5/longsched.json"


def main():
    n = 200000
    lca = "0.18"
    resume = None
    argv = sys.argv[1:]
    while argv:
        if argv[0].replace(".", "").isdigit():
            n = int(float(argv[0])); argv = argv[1:]
        elif argv[0] == "--lca":
            lca = argv[1]; argv = argv[2:]
        elif argv[0] == "--resume":
            resume = argv[1]; argv = argv[2:]
        else:
            raise SystemExit(f"unknown arg {argv[0]}")

    results = []
    if os.path.isfile(OUT):
        results = json.load(open(OUT))
    key = (lca, n)
    if any((r["synth_lca_val"], r["n_iters"]) == key and "stability" in r
           for r in results):
        print(f"arm lca={lca} n={n} already recorded in {OUT}", flush=True)
        return

    overrides = arm_overrides(lca)
    prepare_dataset_cpu(n, overrides)
    args = base_args(n, overrides)
    # long-run cadence: ~20 numbered checkpoints, chunked dispatch
    args.save_every = max(500, n // 20)
    args.display_every = max(250, n // 40)
    args.log_every = max(250, n // 200)
    args.steps_per_chunk = 500 if n >= 10000 else 250
    if resume:
        args.resume_from = resume

    print(f"=== paper-schedule run: lca={lca} n={n} "
          f"(decay {int(n*0.75)}) ===", flush=True)
    t0 = time.time()
    out = train_composite(args)
    wall = time.time() - t0
    log_dir = out["log_dir"]
    if out.get("diverged_at") is not None:
        row = {"synth_lca_val": lca, "n_iters": n, "status": "DIVERGED",
               "diverged_at": out["diverged_at"],
               "diverged_terms": out.get("diverged_terms"),
               "log_dir": log_dir, "wall_sec": round(wall, 1)}
        results.append(row)
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        json.dump(results, open(OUT, "w"), indent=1)
        print(f"DIVERGED at {out['diverged_at']} -> {OUT}")
        sys.exit(3)

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
        "n_iters": n,
        "log_dir": log_dir,
        "wall_sec": round(wall, 1),
        "evals": [e for e in evals if e],
        "stability": stability(evals),
        "headline_best": next(
            (e for e in evals if e and e["ckpt"] == "checkpoint-best"), None),
    }
    results.append(row)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    json.dump(results, open(OUT, "w"), indent=1)
    s = row["stability"]
    print(f"lca={lca} n={n}: peak={s.get('peak_psnr'):.2f}@{s.get('peak_step')} "
          f"final={s.get('final_psnr'):.2f} "
          f"corr(peak/final)={s.get('peak_dyn_corr')}/{s.get('final_dyn_corr')}",
          flush=True)
    print(f"-> {OUT}")


if __name__ == "__main__":
    main()
