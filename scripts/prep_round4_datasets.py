"""Pre-build every round-4 campaign dataset on CPU, sequentially.

The campaign jobs (scripts/tpu_campaign.sh) each build their dataset on
demand, but doing it inside the TPU job burns the job's wedge-watchdog
budget on CPU work. This driver front-loads all of it; every stage is
skip-if-exists, so re-running (or racing the campaign) is harmless.

Usage: python scripts/prep_round4_datasets.py
"""
import importlib.util
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)


def load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def stage(label, fn):
    t0 = time.time()
    print(f"=== prep: {label}", flush=True)
    try:
        fn()
    except Exception as e:
        print(f"!!! prep {label} FAILED: {e}", flush=True)
        return False
    print(f"=== prep: {label} done ({time.time() - t0:.0f}s)", flush=True)
    return True


def prep_config_dataset(extra):
    """only_prepare_data run of a config on CPU (skip handled by caller)."""
    subprocess.run(
        [sys.executable, "-m", "nerfca_tpu.train.run_composite",
         "--config", "configs/synth-4view-best.txt",
         "--data_root", "data", "--use_wandb", "false",
         "--only_prepare_data", "true", "--platform", "cpu", *extra],
        check=True,
    )


def main():
    ok = []
    # 1. clean-protocol dataset (synth-4view-best verbatim)
    clean = load("tpu_clean_protocol")
    ok.append(stage("clean-protocol", clean.prepare_dataset_cpu))

    # 2. contrast arms
    contrast = load("tpu_contrast_sweep")
    for lca in contrast.CONTRASTS:
        ok.append(stage(
            f"contrast lca={lca}",
            lambda lca=lca: contrast.prepare_dataset_cpu(
                6000, contrast.arm_overrides(lca)),
        ))

    # 3. 2/3-view presets at the quality recipe
    presets = load("tpu_preset_views")
    for numb, step_size in presets.PRESETS.items():
        ok.append(stage(
            f"{numb}-view preset",
            lambda numb=numb, step_size=step_size: prep_config_dataset(
                ["--data_numb_angles", str(numb),
                 "--data_step_size", step_size]),
        ))

    # 4. CCTA surrogate: volumes + dataset
    ccta = load("tpu_ccta_surrogate")
    ok.append(stage("ccta volumes", ccta.stage1_volumes))
    ok.append(stage("ccta dataset", lambda: ccta.stage2_dataset(6000)))

    # 5. XCAT surrogate: full driver-contract pipeline + dataset
    xcat = load("tpu_xcat_surrogate")
    ok.append(stage("xcat pipeline", xcat.stage1_xcat_pipeline))
    ok.append(stage("xcat dataset", lambda: xcat.stage2_dataset(6000)))

    print(f"prep complete: {sum(ok)}/{len(ok)} stages ok", flush=True)
    sys.exit(0 if all(ok) else 1)


if __name__ == "__main__":
    main()
