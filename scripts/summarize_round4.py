"""Collect the round-4 campaign artifacts into BENCH-ready markdown tables.

Reads whichever of these exist and prints a markdown summary:
  - cases/SYNTH-FOVHC/clean_protocol.json   (clean-protocol headline + time-to-quality)
  - cases/SYNTH/contrast_sweep-<n>.json     (contrast-vs-stability curve)
  - cases/SYNTH/contrast_repair-<n>.json    (repair arms at the failing contrast)
  - cases/SYNTH/preset_views.json           (2/3-view presets)
  - cases/MAGIX-SURR/surrogate_run.json     (CCTA pipeline end-to-end)
  - cases/XCAT-SURR/surrogate_run.json      (XCAT driver-contract pipeline end-to-end)

Usage: python scripts/summarize_round4.py
"""
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fmt(x, nd=2):
    if x is None:
        return "—"
    return f"{x:.{nd}f}"


def clean_protocol():
    p = "cases/SYNTH-FOVHC/clean_protocol.json"
    if not os.path.isfile(p):
        p = "artifacts/round4/clean_protocol/clean_protocol.json"
    if not os.path.isfile(p):
        return
    r = json.load(open(p))
    b = r["headline_checkpoint_best"]
    print("\n## Clean-protocol 4-view headline (selection (0,0) disjoint)\n")
    print(f"run: `{r['log_dir']}`  train wall {r['train_wall_s']}s")
    print(
        f"\n**checkpoint-best (step {b.get('step')}): "
        f"{fmt(b.get('mean_psnr'))} dB / {fmt(b.get('mean_ssim'), 3)} SSIM / "
        f"dyn_corr {fmt(b.get('mean_dyn_corr'), 3)} / "
        f"dyn_psnr {fmt(b.get('mean_dyn_psnr'))} "
        f"(masked {fmt(b.get('mean_dyn_psnr_masked'))})**\n"
    )
    print("| step | est wall (s) | 40-view PSNR | dyn_corr |")
    print("|---|---|---|---|")
    for t in r.get("time_to_quality", []):
        print(
            f"| {t['step']} | {t['est_wall_s']} | {fmt(t['mean_psnr'])} "
            f"| {fmt(t.get('mean_dyn_corr'), 3)} |"
        )


def contrast():
    paths = sorted(glob.glob("cases/SYNTH/contrast_sweep-*.json"))
    for p in paths:
        rows = json.load(open(p))
        print(f"\n## Contrast sweep ({p})\n")
        print("| lca | x tissue | peak PSNR @step | final PSNR | drop | "
              "corr peak/final |")
        print("|---|---|---|---|---|---|")
        for r in sorted(rows, key=lambda r: -float(r["synth_lca_val"])):
            s = r.get("stability", {})
            print(
                f"| {r['synth_lca_val']} | {r['contrast_ratio_vs_tissue']} "
                f"| {fmt(s.get('peak_psnr'))} @{s.get('peak_step')} "
                f"| {fmt(s.get('final_psnr'))} "
                f"| {s.get('psnr_drop_peak_to_final')} "
                f"| {fmt(s.get('peak_dyn_corr'), 3)}/{fmt(s.get('final_dyn_corr'), 3)} |"
            )


def presets():
    p = "cases/SYNTH/preset_views.json"
    if not os.path.isfile(p):
        return
    rows = json.load(open(p))
    print("\n## 2/3-view preset runs\n")
    print("| views | ckpt | step | PSNR | SSIM | dyn_corr |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        for which in ("checkpoint-best", "checkpoint"):
            e = r.get(which)
            if e:
                print(
                    f"| {r['numb_angles']} | {which} | {e.get('step')} "
                    f"| {fmt(e.get('mean_psnr'))} | {fmt(e.get('mean_ssim'), 3)} "
                    f"| {fmt(e.get('mean_dyn_corr'), 3)} |"
                )


def repair():
    paths = sorted(glob.glob("cases/SYNTH/contrast_repair-*.json"))
    for p in paths:
        rows = json.load(open(p))
        print(f"\n## Contrast repair arms ({p})\n")
        print("| repair | lca | peak PSNR @step | final PSNR | drop | "
              "corr peak/final |")
        print("|---|---|---|---|---|---|")
        for r in rows:
            s = r.get("stability", {})
            print(
                f"| {r['repair']} | {r['synth_lca_val']} "
                f"| {fmt(s.get('peak_psnr'))} @{s.get('peak_step')} "
                f"| {fmt(s.get('final_psnr'))} "
                f"| {s.get('psnr_drop_peak_to_final')} "
                f"| {fmt(s.get('peak_dyn_corr'), 3)}/{fmt(s.get('final_dyn_corr'), 3)} |"
            )


def surrogate(p, title):
    if not os.path.isfile(p):
        return
    r = json.load(open(p))
    b = r["headline_checkpoint_best"]
    print(f"\n## {title}\n")
    print(f"run: `{r['log_dir']}`  train wall {r['train_wall_s']}s")
    print(
        f"\ncheckpoint-best (step {b.get('step')}): "
        f"{fmt(b.get('mean_psnr'))} dB / {fmt(b.get('mean_ssim'), 3)} SSIM / "
        f"dyn_corr {fmt(b.get('mean_dyn_corr'), 3)} / "
        f"dyn_psnr_masked {fmt(b.get('mean_dyn_psnr_masked'))}\n"
    )
    print("| step | PSNR | dyn_corr |")
    print("|---|---|---|")
    for e in r.get("per_checkpoint_40view", []):
        print(f"| {e['step']} | {fmt(e['mean_psnr'])} "
              f"| {fmt(e.get('mean_dyn_corr'), 3)} |")


if __name__ == "__main__":
    clean_protocol()
    contrast()
    repair()
    presets()
    surrogate("cases/MAGIX-SURR/surrogate_run.json",
              "CCTA-surrogate end-to-end (MAGIX preset geometry)")
    surrogate("cases/XCAT-SURR/surrogate_run.json",
              "XCAT-surrogate end-to-end (real driver contract)")
