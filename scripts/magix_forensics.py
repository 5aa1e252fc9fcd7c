"""NaN forensics for the MAGIX-SURR CCTA-surrogate run (round-5 item 1).

The round-4 end-to-end run (cases/MAGIX-SURR/runs/2026-08-19-043005-composite)
had a healthy step-0 loss (2.3e-4) and all-NaN params by step 250. This runs
the IDENTICAL config with per-step logging (log_every=1, steps_per_chunk=10)
so metrics.jsonl pins the exact divergence step and the first non-finite
loss term.

Usage: python scripts/magix_forensics.py [n_iters=300]
"""
import json
import os
import sys

_here = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_here))
sys.path.insert(0, _here)

from nerfca_tpu.train.trainer import train_composite
from tpu_ccta_surrogate import build  # same config builder


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    args = build(n)
    args.log_every = 1
    args.steps_per_chunk = 10
    args.display_every = 10_000_000  # no in-loop eval
    args.save_every = 10_000_000
    out = train_composite(args)
    log_dir = out["log_dir"]

    rows = []
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    first_bad = None
    for r in rows:
        bad = [
            k for k, v in r.items()
            if isinstance(v, float) and (v != v or abs(v) == float("inf"))
        ]
        if bad:
            first_bad = (r["step"], bad)
            break
    print("log_dir:", log_dir)
    if first_bad is None:
        print(f"NO divergence within {n} steps ({len(rows)} rows)")
    else:
        s, bad = first_bad
        print(f"FIRST non-finite at step {s}: {bad}")
        for r in rows:
            if s - 5 <= r["step"] <= s:
                print(json.dumps({k: r[k] for k in sorted(r) if k != "_time"}))


if __name__ == "__main__":
    main()
