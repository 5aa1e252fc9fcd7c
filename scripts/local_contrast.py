"""Measure each dataset's EFFECTIVE (local) vessel contrast.

Round-5 forensic: MAGIX-SURR holds dyn_corr ~0.59 over a full 6k run
while SYNTH at synth_lca_val=0.18 collapses by step 1000 — yet both were
described as "~1.0x tissue" points. Global iso-intensity is the wrong
measure: separation difficulty tracks the vessel's contrast against its
IMMEDIATE surroundings (the structures it must be disambiguated from
along rays). This computes, for each case,

    local_ratio = mean(full[vessel]) / mean(full[4-voxel peri-vessel shell])

For the SYNTH sweep arms the phantom is regenerated analytically (exact
sweep-arm geometry: size 96, vessel_radius 0.065); for the surrogate
cases the built volumes are read from data/.

Writes artifacts/round5/local_contrast.json.
Usage: python scripts/local_contrast.py
"""
import json
import os
import sys

import numpy as np
from scipy import ndimage

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ledgers import write_json_mirrored  # noqa: E402

OUT = "artifacts/round5/local_contrast.json"


def local_ratio(full: np.ndarray, dyn: np.ndarray, shell_iters: int = 4):
    vm = dyn > 0.5 * dyn.max()
    shell = ndimage.binary_dilation(vm, iterations=shell_iters) & ~vm
    return {
        "vessel_mean": float(full[vm].mean()),
        "peri_mean": float(full[shell].mean()),
        "local_ratio": float(full[vm].mean() / full[shell].mean()),
        "vessel_voxels": int(vm.sum()),
    }


def main():
    from nerfca_tpu.data.phantom import (
        synthetic_phantom_volume, synthetic_vessel_volume,
    )

    rows = {}
    kw = dict(size=96, phase=0.0, vessel_radius=0.065)
    for lca in ("0.18", "0.35", "0.5", "0.8", "1.2", "1.6", "2.4"):
        full = synthetic_phantom_volume(lca_val=float(lca), **kw)
        dyn = synthetic_vessel_volume(lca_val=float(lca), **kw)
        rows[f"SYNTH-FOVC lca={lca}"] = {
            "global_ratio_vs_tissue": round(float(lca) / 0.18, 2),
            **local_ratio(full, dyn),
        }

    for name, root in (
        ("MAGIX-SURR", "data/MAGIX-SURR-vols/0"),
        ("XCAT-SURR", "data/XCAT-SURR/0"),
    ):
        fp = os.path.join(root, "full_volume_tigre.npy")
        dp = os.path.join(root, "dyn_volume_tigre.npy")
        if os.path.isfile(fp) and os.path.isfile(dp):
            rows[name] = local_ratio(np.load(fp), np.load(dp))
        else:
            rows[name] = {"status": "volumes not built"}

    write_json_mirrored(rows, OUT)
    for k, v in rows.items():
        print(k, json.dumps(v))


if __name__ == "__main__":
    main()
