"""Repair arms at the contrast where the stable 4-view regime dies.

Follow-up to ``scripts/tpu_contrast_sweep.py`` (VERDICT r3 item 2): once
the sweep locates the first contrast whose final 40-view dyn_corr falls
below 0.7 (or whose post-peak PSNR collapse exceeds 4 dB), this script
runs the candidate repair levers VERDICT named at exactly that contrast:

  * ``hl1``      — hull-gated static L1 (CompositeHParams.hull_static_l1_*):
                   penalize static line-integral mass INSIDE the motion
                   hull so the static field cannot absorb the (now faint)
                   vessel. Weight is a traced schedule input, so the two
                   hl1 arms share one compile with the base recipe.
  * ``longwin``  — window decay = 100% of the run (vs the recipe's 75%):
                   low contrast needs the full schedule before high
                   frequencies open (recompiles: decay steps are static).
  * ``varmax``   — variance-map pixel weighting amplified 3x
                   (``weighted_loss_max = 3``): up-weights exactly the
                   pixels where the faint vessel moves (data-side, no
                   recompile).
  * ``hl1_longwin`` — the two structural levers combined.

Target selection: reads ``cases/SYNTH/contrast_sweep-<n>.json`` and picks
the HIGHEST-contrast failing arm (the threshold the sweep found), unless
``--lca X`` overrides. Results append to
``cases/SYNTH/contrast_repair-<n>.json`` with the same resume semantics
as the sweep (finished arms are skipped; ``--force`` redoes).

Usage: python scripts/tpu_contrast_repair.py [n_iters=6000]
           [--lca 0.5] [--arms hl1,longwin,...] [--force]
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_contrast_sweep import (  # noqa: E402
    arm_overrides, base_args, prepare_dataset_cpu, eval_ckpt, stability,
)
from nerfca_tpu.train.trainer import train_composite  # noqa: E402

CORR_OK = 0.7
DROP_OK = 4.0

REPAIRS = {
    # name -> extra CLI overrides on top of the sweep recipe
    "hl1": {
        "hull_static_l1_weight_start": "1e-8",
        "hull_static_l1_weight_end": "1e-4",
    },
    "hl1_hi": {
        "hull_static_l1_weight_start": "1e-6",
        "hull_static_l1_weight_end": "1e-3",
    },
    "longwin": {"_window_frac": "1.0"},
    "varmax": {"weighted_loss_max": "3"},
    "hl1_longwin": {
        "hull_static_l1_weight_start": "1e-8",
        "hull_static_l1_weight_end": "1e-4",
        "_window_frac": "1.0",
    },
    # Permanent static-field frequency cap: with the vessel iso-intense,
    # the collapse mechanism is the static field absorbing the vessel once
    # its encoding window opens past the vessel's spatial scale. Capping
    # the STATIC window at 6 of L=12 bands (the dynamic field keeps the
    # full schedule) denies the static field that representation capacity
    # permanently — the thin high-frequency mover can only live in the
    # dynamic field. Eval reconstructs the capped window from checkpoint
    # metadata (load_field_configs), so scoring stays train-consistent.
    "wincap": {"static_pos_enc_window_max": "6"},
    "wincap_hl1": {
        "static_pos_enc_window_max": "6",
        "hull_static_l1_weight_start": "1e-8",
        "hull_static_l1_weight_end": "1e-4",
    },
    # Round-5 arms (VERDICT r4 item 3). The round-4 data splits the failure
    # in two: hl1/varmax retain final dyn_corr ~0.95 while the IMAGE
    # collapses, and collapse_forensics shows the static field memorizing
    # post-peak while the dynamic field keeps improving. The direct fix is
    # the two-phase schedule: freeze the static field at its peak
    # (static_freeze_step, traced -> shares the compile) so it can neither
    # memorize nor absorb the vessel, and let the dynamic field finish.
    "freeze500": {"static_freeze_step": "500"},
    "freeze1000": {"static_freeze_step": "1000"},
    # freeze + the image-gentlest retention levers from round 4
    "freeze_varmax_longwin": {
        "static_freeze_step": "750",
        "weighted_loss_max": "3",
        "_window_frac": "1.0",
    },
    # everything: freeze + hull-L1 + varmax + longwin
    "combo_all": {
        "static_freeze_step": "750",
        "hull_static_l1_weight_start": "1e-8",
        "hull_static_l1_weight_end": "1e-4",
        "weighted_loss_max": "3",
        "_window_frac": "1.0",
    },
    # AdamW weight decay on the MLP weight matrices (--weight_decay,
    # round-5 extension): the XCAT-SURR step-6000 panels show the static
    # field memorizing the 4 train views as axis-aligned stripe patterns
    # once its window opens — the textbook overfit weight decay counters.
    "wd3": {"weight_decay": "1e-3"},
    "wd2": {"weight_decay": "1e-2"},
    "wd_varmax_longwin": {
        "weight_decay": "1e-3",
        "weighted_loss_max": "3",
        "_window_frac": "1.0",
    },
    # along-ray static TV (--static_tv_weight_*, round-5 extension): the
    # sparse-view-CT smoothness prior aimed directly at the along-ray
    # memorization speckle; runs on the XLA path (fused kernel falls
    # back), ~2x step time — quality arms only. Raw TV magnitude at the
    # recipe shapes is O(1) per ray vs a ~4e-6 pixel loss, hence weights
    # around 1e-7.
    "tv7": {"static_tv_weight_start": "1e-7", "static_tv_weight_end": "1e-9"},
    "tv6": {"static_tv_weight_start": "1e-6", "static_tv_weight_end": "1e-8"},
    "tv_wd_longwin": {
        "static_tv_weight_start": "1e-7",
        "static_tv_weight_end": "1e-9",
        "weight_decay": "1e-3",
        "_window_frac": "1.0",
    },
}


def arm_ok(row: dict) -> bool:
    s = row.get("stability", {})
    corr = s.get("final_dyn_corr")
    drop = s.get("psnr_drop_peak_to_final")
    return (
        corr is not None
        and drop is not None
        and corr >= CORR_OK
        and drop <= DROP_OK
    )


def pick_target(sweep_rows: list) -> str:
    """LOWEST-contrast failing arm — the decisive XCAT-like (~1.0x tissue)
    point is what the repair campaign must crack, not the threshold edge
    (round-4 targeted the highest failing contrast, 0.5, by mistake —
    VERDICT r4 weak #2)."""
    failing = [r for r in sweep_rows if not arm_ok(r)]
    if not failing:
        print("no failing arm in the sweep ledger — nothing to repair")
        raise SystemExit(0)
    return min(failing, key=lambda r: float(r["synth_lca_val"]))[
        "synth_lca_val"
    ]


def repair_args(n: int, lca: str, repair: dict):
    overrides = dict(arm_overrides(lca))
    window_frac = float(repair.pop("_window_frac", 0.75))
    overrides.update(repair)
    args = base_args(n, overrides)
    if window_frac != 0.75:
        args.static_pos_enc_window_decay_steps = int(n * window_frac)
        args.temp_pos_enc_window_decay_steps = int(n * window_frac)
    return args


def main():
    n = 6000
    argv = sys.argv[1:]
    if argv and argv[0].replace(".", "").isdigit():
        n = int(float(argv[0]))
        argv = argv[1:]
    lca = None
    arms = list(REPAIRS)
    force = False
    while argv:
        if argv[0] == "--lca":
            lca = argv[1]
            argv = argv[2:]
        elif argv[0] == "--arms":
            arms = argv[1].split(",")
            argv = argv[2:]
        elif argv[0] == "--force":
            force = True
            argv = argv[1:]
        else:
            raise SystemExit(f"unknown arg {argv[0]}")

    sweep_path = f"cases/SYNTH/contrast_sweep-{n}.json"
    sweep_rows = (
        json.load(open(sweep_path)) if os.path.isfile(sweep_path) else []
    )
    if lca is None:
        lca = pick_target(sweep_rows)
    base_row = next(
        (r for r in sweep_rows if r["synth_lca_val"] == lca), None
    )
    print(f"repair target: lca={lca}"
          + (f" (sweep: {json.dumps(base_row['stability'])})"
             if base_row else ""), flush=True)

    out_path = f"cases/SYNTH/contrast_repair-{n}.json"
    results = []
    if os.path.isfile(out_path):
        results = json.load(open(out_path))
        key = lambda r: (r["repair"], r["synth_lca_val"])  # noqa: E731
        if force:
            results = [r for r in results
                       if not (r["synth_lca_val"] == lca and r["repair"] in arms)]
        else:
            done = {key(r) for r in results}
            skipped = [a for a in arms if (a, lca) in done]
            if skipped:
                print(f"resuming: arms {skipped} already recorded", flush=True)
            arms = [a for a in arms if (a, lca) not in done]

    prepare_dataset_cpu(n, arm_overrides(lca))
    for name in arms:
        print(f"\n=== repair {name} @ lca={lca} ===", flush=True)
        args = repair_args(n, lca, dict(REPAIRS[name]))
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
            eval_ckpt(n, arm_overrides(lca), c, write_images=c.endswith("-best"))
            for c in ckpts
        ]
        row = {
            "repair": name,
            "synth_lca_val": lca,
            "overrides": REPAIRS[name],
            "log_dir": log_dir,
            "wall_sec": round(wall, 1),
            "diverged_at": out.get("diverged_at"),
            "stability": stability(evals),
            "evals": [e for e in evals if e],
        }
        results.append(row)
        print(json.dumps({k: row[k] for k in ("repair", "stability")}),
              flush=True)
        from ledgers import write_json_mirrored
        write_json_mirrored(results, out_path)

    print("\n=== repair-vs-stability @ lca", lca, "===")
    if base_row:
        s = base_row["stability"]
        print(f"{'base':>12} peak={s.get('peak_psnr', 0):.2f} "
              f"final={s.get('final_psnr', 0):.2f} "
              f"corr(final)={s.get('final_dyn_corr')}")
    for r in results:
        if r["synth_lca_val"] != lca:
            continue
        s = r.get("stability", {})
        print(f"{r['repair']:>12} peak={s.get('peak_psnr', 0):.2f} "
              f"final={s.get('final_psnr', 0):.2f} "
              f"corr(final)={s.get('final_dyn_corr')}")


if __name__ == "__main__":
    main()
