"""Queue-ordered dataset prep for the 4r resume campaign (1-core VM).

Same stages as prep_round4_datasets.py but ordered to match
scripts/tpu_campaign4r.sh's job queue so each TPU job finds its dataset
ready (or nearly so) when it starts. Run at nice 19: on the 1-core VM the
in-job (critical-path) dataset build must win the core; this fills TPU
training time (CPU idle) instead.

Usage: nice -n 19 python scripts/prep_round4r.py
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
    subprocess.run(
        [sys.executable, "-m", "nerfca_tpu.train.run_composite",
         "--config", "configs/synth-4view-best.txt",
         "--data_root", "data", "--use_wandb", "false",
         "--only_prepare_data", "true", "--platform", "cpu", *extra],
        check=True,
    )


def main():
    ok = []
    contrast = load("tpu_contrast_sweep")
    presets = load("tpu_preset_views")
    ccta = load("tpu_ccta_surrogate")

    # campaign 4r order: presets -> ccta -> contrast 1.2, 0.5 -> rest
    # (0.18 is built in-job by the already-running first TPU job)
    for numb, step_size in presets.PRESETS.items():
        ok.append(stage(
            f"{numb}-view preset",
            lambda numb=numb, step_size=step_size: prep_config_dataset(
                ["--data_numb_angles", str(numb),
                 "--data_step_size", step_size]),
        ))
    ok.append(stage("ccta volumes", ccta.stage1_volumes))
    ok.append(stage("ccta dataset", lambda: ccta.stage2_dataset(6000)))
    for lca in ["1.2", "0.5", "2.4", "1.6", "0.8", "0.35"]:
        ok.append(stage(
            f"contrast lca={lca}",
            lambda lca=lca: contrast.prepare_dataset_cpu(
                6000, contrast.arm_overrides(lca)),
        ))
    xcat = load("tpu_xcat_surrogate")
    ok.append(stage("xcat pipeline", xcat.stage1_xcat_pipeline))
    ok.append(stage("xcat dataset", lambda: xcat.stage2_dataset(6000)))

    print(f"prep complete: {sum(ok)}/{len(ok)} stages ok", flush=True)
    sys.exit(0 if all(ok) else 1)


if __name__ == "__main__":
    main()
