"""Evidence-ledger writer with a committed mirror.

Round-5 lesson: a VM restart wiped the gitignored ``cases/`` and ``data/``
trees, losing every run ledger that lived only there (including the first
finite MAGIX-SURR headline).  Campaign runners therefore write each ledger
to its canonical (possibly gitignored) path AND mirror it under
``artifacts/round5/`` so a plain ``git add artifacts`` preserves the
evidence.
"""
import json
import os

MIRROR_DIR = "artifacts/round5"


def write_json_mirrored(obj, path, mirror_name=None):
    """Write ``obj`` as JSON to ``path`` and to the committed mirror.

    ``mirror_name`` defaults to the basename of ``path``; pass an explicit
    name when basenames collide across runners (both surrogate runners
    call their ledger ``surrogate_run.json``).
    """
    paths = [path]
    mirror = os.path.join(MIRROR_DIR, mirror_name or os.path.basename(path))
    if os.path.abspath(mirror) != os.path.abspath(path):
        paths.append(mirror)
    for p in paths:
        d = os.path.dirname(p)
        if d:
            os.makedirs(d, exist_ok=True)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f, indent=2)
        os.replace(tmp, p)
    return mirror
