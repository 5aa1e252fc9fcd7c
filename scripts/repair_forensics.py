"""Per-arm collapse forensics over a contrast-repair ledger (CPU-only).

VERDICT r4 item 3's negative-result branch: if no 0.18 arm holds
(dyn_corr >= 0.5 AND image PSNR >= 12 at step 6000), the committed
artifact must carry per-arm forensics, not just final numbers. For every
arm this cross-references the 40-view eval trajectory with the run's own
metrics.jsonl and classifies the failure:

  - collapse_step: first eval step whose mean_psnr sits > 2 dB below the
    trajectory peak (None = never collapsed).
  - corr_at_collapse / final: does the arm keep FINDING the vessel while
    the image dies (the round-4 "corr 0.95 at collapse" split)?
  - train_psnr_final vs image trajectory: train fit that keeps improving
    while the 40-view image falls = 4-view memorization; train fit that
    falls too = divergence/regularizer crush.
  - sigma_d_max trend: dynamic field mass crushed (occlusion/entropy won)
    vs retained.

Usage: python scripts/repair_forensics.py [ledger] [--lca 0.18]
Writes artifacts/round5/repair_forensics-<lca>.json and prints a table.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _metrics_rows(log_dir):
    path = os.path.join(log_dir, "metrics.jsonl")
    if not os.path.isfile(path):
        return []
    return [json.loads(l) for l in open(path)]


def analyze_arm(row) -> dict:
    evals = [e for e in row.get("evals", [])
             if e and e.get("ckpt") != "checkpoint-best"
             and e.get("mean_psnr") is not None]
    out = {
        "arm": row.get("repair", row.get("arm", "?")),
        "lca": row.get("synth_lca_val"),
        "log_dir": row.get("log_dir"),
        "diverged_at": row.get("diverged_at"),
    }
    if not evals:
        out["verdict"] = "no evals"
        return out
    peak = max(evals, key=lambda e: e["mean_psnr"])
    final = evals[-1]
    collapse = next(
        (e for e in evals if e["step"] > peak["step"]
         and e["mean_psnr"] < peak["mean_psnr"] - 2.0),
        None,
    )
    out.update(
        peak_psnr=round(peak["mean_psnr"], 2), peak_step=peak["step"],
        peak_corr=round(peak.get("mean_dyn_corr") or 0.0, 3),
        final_psnr=round(final["mean_psnr"], 2),
        final_corr=round(final.get("mean_dyn_corr") or 0.0, 3),
        collapse_step=collapse["step"] if collapse else None,
        corr_at_collapse=(round(collapse.get("mean_dyn_corr") or 0.0, 3)
                          if collapse else None),
    )

    trains = [r for r in _metrics_rows(row.get("log_dir", ""))
              if "train_psnr" in r]
    if trains:
        # train-side fit around the collapse vs at the end
        out["train_psnr_final"] = round(trains[-1]["train_psnr"], 2)
        if collapse:
            near = min(trains, key=lambda r: abs(r.get("step", 0)
                                                 - collapse["step"]))
            out["train_psnr_at_collapse"] = round(near["train_psnr"], 2)
        sdm = [r.get("train_sigma_d_max") for r in trains
               if r.get("train_sigma_d_max") is not None]
        if sdm:
            out["sigma_d_max_peak"] = round(max(sdm), 4)
            out["sigma_d_max_final"] = round(sdm[-1], 4)

    held = (out["final_corr"] >= 0.5 and out["final_psnr"] >= 12.0
            and out.get("diverged_at") is None)
    if held:
        out["verdict"] = "HOLDS (corr>=0.5, psnr>=12 at end)"
    elif out.get("diverged_at") is not None:
        out["verdict"] = f"diverged at {out['diverged_at']}"
    elif collapse is None:
        out["verdict"] = "stable image but below target"
    else:
        memorized = (out.get("train_psnr_final") is not None
                     and out.get("train_psnr_at_collapse") is not None
                     and out["train_psnr_final"]
                     >= out["train_psnr_at_collapse"] - 0.5)
        crushed = (out.get("sigma_d_max_final") is not None
                   and out.get("sigma_d_max_peak") not in (None, 0)
                   and out["sigma_d_max_final"]
                   < 0.1 * out["sigma_d_max_peak"])
        kinds = []
        if memorized:
            kinds.append("train fit kept improving -> 4-view memorization")
        if crushed:
            kinds.append("dynamic mass crushed (sigma_d_max -90%)")
        if out["final_corr"] >= 0.5:
            kinds.append("vessel still FOUND at the end (image-only death)")
        out["verdict"] = "collapsed: " + ("; ".join(kinds) or "held-out broke")
    return out


def main():
    ledger = "cases/SYNTH/contrast_repair-6000.json"
    lca = None
    argv = sys.argv[1:]
    while argv:
        if argv[0] == "--lca":
            lca = argv[1]; argv = argv[2:]
        else:
            ledger = argv[0]; argv = argv[1:]
    rows = json.load(open(ledger))
    if lca:
        rows = [r for r in rows if str(r.get("synth_lca_val")) == lca]
    analyses = [analyze_arm(r) for r in rows]
    tag = (lca or "all").replace(".", "p")
    out_path = f"artifacts/round5/repair_forensics-{tag}.json"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    json.dump(analyses, open(out_path, "w"), indent=1)
    for a in analyses:
        print(f"{a['arm']:22s} peak={a.get('peak_psnr')}@{a.get('peak_step')} "
              f"final={a.get('final_psnr')}/corr{a.get('final_corr')} "
              f"collapse@{a.get('collapse_step')} :: {a.get('verdict')}")
    print(f"-> {out_path}")


if __name__ == "__main__":
    main()
