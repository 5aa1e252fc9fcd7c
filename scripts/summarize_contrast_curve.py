"""Join the contrast-sweep ledgers into the VERDICT item-4 table.

Sources (any subset may exist; missing ones are skipped):
  - artifacts/round5/contrast_sweep-<n>.json  (campaign sweep rows)
  - artifacts/round5/contrast_curve.json      (backfill ledger, runs dict)
  - artifacts/round5/local_contrast.json      (measured local ratios)

Output: a markdown table
  lca | local ratio | peak PSNR@step | final PSNR | peak corr@step |
  final corr | collapse step
where collapse step = first checkpoint after the PSNR peak whose 40-view
mean PSNR sits more than 3 dB below the peak ("stable" if none), and one
JSON ledger mirrored to artifacts/round5/contrast_curve_table.json.

Usage: python scripts/summarize_contrast_curve.py [n_iters=6000]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ART = "artifacts/round5"


def traj_stats(evals):
    rows = [e for e in evals if e and e.get("ckpt") != "checkpoint-best"]
    rows = [e for e in rows if e.get("mean_psnr") is not None]
    if not rows:
        return None
    rows.sort(key=lambda e: e["step"])
    peak = max(rows, key=lambda e: e["mean_psnr"])
    corr_rows = [e for e in rows if e.get("mean_dyn_corr") is not None]
    cpeak = max(corr_rows, key=lambda e: e["mean_dyn_corr"]) if corr_rows else None
    final = rows[-1]
    collapse = None
    for e in rows:
        if e["step"] > peak["step"] and e["mean_psnr"] < peak["mean_psnr"] - 3.0:
            collapse = e["step"]
            break
    return {
        "peak_psnr": round(peak["mean_psnr"], 2),
        "peak_step": peak["step"],
        "final_psnr": round(final["mean_psnr"], 2),
        "peak_dyn_corr": round(cpeak["mean_dyn_corr"], 3) if cpeak else None,
        "peak_corr_step": cpeak["step"] if cpeak else None,
        "final_dyn_corr": (round(final["mean_dyn_corr"], 3)
                           if final.get("mean_dyn_corr") is not None else None),
        "collapse_step": collapse,
        "n_evals": len(rows),
    }


def load_arms(n):
    arms = {}  # lca str -> (source, evals)
    p = os.path.join(ART, f"contrast_sweep-{n}.json")
    if os.path.isfile(p):
        for r in json.load(open(p)):
            arms[str(r["synth_lca_val"])] = (f"contrast_sweep-{n}.json",
                                             r.get("evals", []))
    p = os.path.join(ART, "contrast_curve.json")
    if os.path.isfile(p):
        for run, r in json.load(open(p)).get("runs", {}).items():
            key = str(r["synth_lca_val"])
            if r.get("arm", "base") != "base" or key in arms:
                continue
            arms[key] = ("contrast_curve.json", r.get("evals", []))
    return arms


def local_ratios():
    p = os.path.join(ART, "local_contrast.json")
    out = {}
    if os.path.isfile(p):
        for k, v in json.load(open(p)).items():
            if k.startswith("SYNTH-FOVC lca="):
                out[k.split("=", 1)[1]] = round(v["local_ratio"], 2)
    return out


def main():
    n = int(float(sys.argv[1])) if len(sys.argv) > 1 else 6000
    ratios = local_ratios()
    rows = []
    for lca, (src, evals) in load_arms(n).items():
        st = traj_stats(evals)
        if st is None:
            continue
        st.update(synth_lca_val=lca, local_ratio=ratios.get(lca), source=src)
        rows.append(st)
    rows.sort(key=lambda r: -float(r["synth_lca_val"]))

    hdr = ("| lca | local ratio | peak PSNR | final PSNR | peak corr | "
           "final corr | collapse step |")
    print(hdr)
    print("|" + "---|" * 7)
    for r in rows:
        print("| {} | {} | {}@{} | {} | {}@{} | {} | {} |".format(
            r["synth_lca_val"], r["local_ratio"],
            r["peak_psnr"], r["peak_step"], r["final_psnr"],
            r["peak_dyn_corr"], r["peak_corr_step"], r["final_dyn_corr"],
            r["collapse_step"] if r["collapse_step"] is not None else "stable"))

    from ledgers import write_json_mirrored
    write_json_mirrored(rows, os.path.join(ART, "contrast_curve_table.json"))


if __name__ == "__main__":
    main()
