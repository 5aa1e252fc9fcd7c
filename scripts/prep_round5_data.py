"""Rebuild every dataset the round-5 TPU queue needs (CPU only).

The mid-round VM wipe deleted `data/` entirely; this rebuilds the
campaign datasets in TPU-queue order so each TPU leg finds its data
ready (the runners' own `prepare_*` stages then no-op):

  1. MAGIX-SURR volumes + projection dataset (next TPU leg)
  2. SYNTH-FOVHC clean-protocol dataset
  3. XCAT-SURR: surrogate dxcat driver, 10 phases at 512x512x401, then
     the projection dataset (the long pole, ~17 GB)
  4. the contrast-sweep SYNTH-FOVC* datasets (0.18 already built by the
     longsched run)

Run at nice 19 so the live TPU job's host thread keeps priority.
Usage: nice -n19 python scripts/prep_round5_data.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def stamp(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import tpu_ccta_surrogate as ccta
    import tpu_xcat_surrogate as xcat
    import tpu_clean_protocol as clean
    from tpu_contrast_sweep import CONTRASTS, arm_overrides, prepare_dataset_cpu

    stamp("1/4 MAGIX-SURR volumes")
    ccta.stage1_volumes()
    stamp("1/4 MAGIX-SURR projection dataset")
    ccta.stage2_dataset(6000)

    stamp("2/4 SYNTH-FOVHC (clean protocol)")
    clean.prepare_dataset_cpu()

    stamp("3/4 contrast-sweep datasets (cheap; before the XCAT long pole)")
    for lca in CONTRASTS:
        prepare_dataset_cpu(6000, arm_overrides(lca))
        stamp(f"  contrast {lca} ready")

    stamp("4/4 XCAT-SURR phases (10x 512x512x401)")
    xcat.stage1_xcat_pipeline()
    stamp("4/4 XCAT-SURR projection dataset")
    xcat.stage2_dataset(6000)
    # sentinel: the campaign's xcat leg waits for this so an inline
    # stage1 never races this builder on the same phase files
    with open(os.path.join("data/XCAT-SURR", ".prep_done"), "w") as f:
        f.write(str(time.time()))

    stamp("ALL DATASETS READY")


if __name__ == "__main__":
    main()
