"""Seed the contrast sweep's resume ledger from the committed backfill.

The 2026-08-20 VM restart wiped ``cases/``, including the sweep's resume
file ``cases/SYNTH/contrast_sweep-6000.json`` — but the arms 0.5, 0.35 and
0.18 were already fully trained AND evaluated pre-wipe, with their
complete per-checkpoint trajectories preserved in the committed
``artifacts/round5/contrast_curve.json`` (the backfill ledger). Without
this seed, campaign 5e's sweep leg would re-train ~2 h of already-measured
arms before reaching the 4 missing ones (2.4, 1.6, 1.2, 0.8).

Each seeded row carries ``"source": "backfill:contrast_curve.json"`` and
the original (wiped) run dir, so the final merged ledger stays honest
about which arms were re-trained post-wipe and which are pre-wipe
evidence. Stability summaries are recomputed here with the sweep's own
``stability()`` so the schema matches live rows exactly.

Usage: python scripts/seed_contrast_sweep_resume.py [n_iters=6000]
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_contrast_sweep import stability  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    curve = json.load(open("artifacts/round5/contrast_curve.json"))["runs"]
    out_path = f"cases/SYNTH/contrast_sweep-{n}.json"
    results = []
    if os.path.isfile(out_path):
        results = json.load(open(out_path))
    done = {r["synth_lca_val"] for r in results}
    for run_dir, row in curve.items():
        if row.get("arm") != "base" or row.get("n_iters") != n:
            continue
        lca = f"{row['synth_lca_val']:g}"
        if lca in done:
            continue
        evals = row.get("evals", [])
        results.append({
            "synth_lca_val": lca,
            "contrast_ratio_vs_tissue": round(float(lca) / 0.18, 2),
            "log_dir": run_dir,
            "source": "backfill:contrast_curve.json (pre-wipe run)",
            "stability": stability(evals),
            "evals": evals,
        })
        done.add(lca)
        print(f"seeded arm {lca} from {run_dir}")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(results, f, indent=1)
    os.replace(tmp, out_path)
    print(f"{out_path}: {sorted(done)}")


if __name__ == "__main__":
    main()
