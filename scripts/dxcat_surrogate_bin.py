#!/usr/bin/env python3
"""Surrogate ``dxcat1_bin``: same CLI contract as the proprietary XCAT
generator (``<bin> <par_file> <save_name>``, run with cwd = the XCAT data
dir), emitting ``<save_name>_atn_1.bin`` raw float32 volumes from
``nerfca_tpu.data.xcat_surrogate``.

Install by copying (or symlinking) to ``<xcat_path>/dxcat1_bin`` with the
executable bit set — ``data/xcat.py::run_xcat_binary`` then invokes it
exactly as it would the real binary. The cardiac phase comes from the
``hrt_start_phase_index`` line of the par file (first tab-separated token,
the reference's override convention); ``noarteries`` in the save name
selects the artery-free paired run.

Env overrides for reduced-scale tests:
  XCAT_SURR_DIMS="64,64,50"  XCAT_SURR_DVOXEL="2.0"
"""
import os
import sys

sys.path.insert(
    0,
    os.environ.get(
        "NERFCA_REPO",
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ),
)

from nerfca_tpu.data.xcat_surrogate import D_VOXEL_MM, XCAT_DIMS, write_bin  # noqa: E402


def main() -> None:
    par_file, save_name = sys.argv[1], sys.argv[2]
    phase = 0.0
    with open(par_file) as f:
        for line in f:
            if "hrt_start_phase_index" in line:
                phase = float(line.split("\t")[0])
                break
    dims = XCAT_DIMS
    d_voxel = D_VOXEL_MM
    if os.environ.get("XCAT_SURR_DIMS"):
        dims = tuple(int(v) for v in os.environ["XCAT_SURR_DIMS"].split(","))
        d_voxel = float(os.environ.get("XCAT_SURR_DVOXEL", d_voxel))
    bg_cache = os.path.join(
        os.path.dirname(os.path.abspath(sys.argv[0])),
        f"surrogate_bg_{'x'.join(map(str, dims))}.raw",
    )
    write_bin(
        save_name,
        phase,
        with_arteries="noarteries" not in os.path.basename(save_name),
        bg_cache=bg_cache,
        dims=dims,
        d_voxel_mm=d_voxel,
    )


if __name__ == "__main__":
    main()
