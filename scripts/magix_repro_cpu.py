"""CPU reproduction of the MAGIX-SURR step-126 NaN (XLA path, no Pallas).

If the identical config (minus Pallas) diverges at the same step on CPU,
the root cause is the loss/optimizer math, not the TPU kernel.
"""
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from nerfca_tpu.train.trainer import train_composite
from tpu_ccta_surrogate import build


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    args = build(6000)          # identical schedules to the 6000-step run
    args.n_iters = n
    args.platform = "cpu"
    args.use_pallas = False
    args.use_fused_loss = False
    args.log_every = 1
    args.steps_per_chunk = 2
    args.display_every = 10_000_000
    args.save_every = n         # keep the pre-collapse state for the autopsy
    from nerfca_tpu.train.config import apply_platform
    apply_platform("cpu")
    out = train_composite(args)
    print("log_dir:", out["log_dir"], "diverged_at:", out.get("diverged_at"),
          "terms:", out.get("diverged_terms"))


if __name__ == "__main__":
    main()
