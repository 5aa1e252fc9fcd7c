"""Run the ACTUAL reference trainer (kirstenmaas/NeRF-CA, torch CPU) on this
repo's own dataset artifacts.

Two uses (VERDICT round-2 items 1 and 5):

  1. Trajectory-level A/B for the static/dynamic decomposition: run the
     reference ``train()`` (``/root/reference/train/run_composite.py:41-461``)
     on the same SYNTH 4-view dataset our trainer consumes, with identical
     config, then score the trained reference models over ``evaluate.json``
     with the same metrics ``nerfca_tpu.train.run_eval`` reports
     (psnr/ssim/dyn_psnr/dyn_corr). If the reference separates where we do
     not, it is our bug; if neither separates, the operating point is the
     problem.

        python scripts/ref_trainer_harness.py --config configs/refab.txt

  2. Measured PyTorch baseline throughput (BASELINE.md): time the reference
     iteration at the flagship composite.txt shapes on this host's CPU.

        python scripts/ref_trainer_harness.py --time_only --config configs/refbench.txt

Nothing is copied from the reference: its modules are imported from
``/root/reference`` and executed in place (same mechanism as
``tests/test_reference_oracle.py``). The reference's missing deps (wandb,
configargparse, tigre via preprocess.datatoray) are stubbed at the module
level — the stubs only record or no-op; every trained number comes from
reference code.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time
import types

import numpy as np

REF = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------------------
# stubs
# ---------------------------------------------------------------------------

class _WandbRecorder:
    """Captures every wandb.log dict the reference trainer emits."""

    def __init__(self) -> None:
        self.records: list[dict] = []

    def scalars(self) -> list[dict]:
        out = []
        for rec in self.records:
            row = {}
            for k, v in rec.items():
                if hasattr(v, "item"):
                    try:
                        row[k] = float(v.item())
                        continue
                    except (ValueError, RuntimeError):
                        pass
                if isinstance(v, (int, float, str, bool)) or v is None:
                    row[k] = v
            if row:
                out.append(row)
        return out


def _install_stubs(recorder: _WandbRecorder) -> None:
    # ---- wandb ----
    wandb = types.ModuleType("wandb")
    wandb.login = lambda *a, **k: None
    wandb.init = lambda *a, **k: None
    wandb.log = lambda d, *a, **k: recorder.records.append(dict(d))
    wandb.Image = lambda x, *a, **k: ("image", None)
    wandb.sweep = lambda *a, **k: None
    wandb.agent = lambda *a, **k: None

    class _Cfg(dict):
        pass

    wandb.config = _Cfg()
    sys.modules["wandb"] = wandb

    # ---- configargparse ----
    # The reference's ~60-flag parser uses ``is_config_file=True`` plus a
    # ``key = value`` txt file whose entries act as typed defaults, with CLI
    # flags overriding them (train/data_helpers.py:10-15). This shim
    # reproduces exactly that precedence on top of stdlib argparse.
    cap = types.ModuleType("configargparse")

    class _ConfigArgumentParser(argparse.ArgumentParser):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            self._config_dests: list[str] = []

        def add_argument(self, *args, **kwargs):
            if kwargs.pop("is_config_file", False):
                action = super().add_argument(*args, **kwargs)
                self._config_dests.append(action.dest)
                return action
            return super().add_argument(*args, **kwargs)

        def parse_args(self, args=None, namespace=None):  # noqa: D401
            argv = list(sys.argv[1:]) if args is None else list(args)
            pre, _ = super().parse_known_args(argv)
            for dest in self._config_dests:
                path = getattr(pre, dest, None)
                if not path or not os.path.isfile(path):
                    continue
                values = _read_config_txt(path)
                for action in self._actions:
                    if action.dest in values:
                        raw = values[action.dest]
                        typed = action.type(raw) if action.type else raw
                        action.default = typed
            return super().parse_args(argv, namespace)

    cap.ArgumentParser = _ConfigArgumentParser
    sys.modules["configargparse"] = cap

    # ---- preprocess.datatoray ----
    # The trainer calls datatoray() unconditionally (run_composite.py:62-63)
    # to regenerate the dataset with the TIGRE CUDA projector. Our dataset
    # artifacts (same contract) already exist on disk, so this is a no-op.
    pre_pkg = types.ModuleType("preprocess")
    pre_pkg.__path__ = []  # mark as package
    dtr = types.ModuleType("preprocess.datatoray")
    dtr.datatoray = lambda args: None
    pre_pkg.datatoray = dtr
    sys.modules["preprocess"] = pre_pkg
    sys.modules["preprocess.datatoray"] = dtr


def _read_config_txt(path: str) -> dict[str, str]:
    values: dict[str, str] = {}
    with open(path) as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line or "=" not in line:
                continue
            key, val = line.split("=", 1)
            values[key.strip()] = val.strip().strip("'\"")
    return values


def load_reference_trainer(recorder: _WandbRecorder):
    """Import the reference run_composite module with its train/ + root
    modules resolvable, the way the reference's own launch layout does."""
    for p in (os.path.join(REF, "train"), REF):
        if p not in sys.path:
            sys.path.insert(0, p)
    _install_stubs(recorder)
    spec = importlib.util.spec_from_file_location(
        "ref_run_composite", os.path.join(REF, "train", "run_composite.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# post-train evaluation with the reference's own forward/render functions
# ---------------------------------------------------------------------------

def _load_ref_model(path: str, mod):
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    definition = dict(payload["parameters"])
    definition["device"] = torch.device("cpu")
    cls_name = os.path.basename(path)
    if cls_name.startswith("tempmodel"):
        from model.Temporal import Temporal  # reference module

        model = Temporal(definition)
    else:
        from model.CPPN import CPPN  # reference module

        model = CPPN(definition)
    model.load_state_dict(payload["model"])
    if "freq_mask_alpha" in payload:
        model.freq_mask_alpha = payload["freq_mask_alpha"]
    if "windowed_alpha" in payload:
        model.windowed_alpha = payload["windowed_alpha"]
    model.eval()
    return model


def evaluate_reference_run(run_dir: str, args, mod) -> dict:
    """Score the saved reference models over evaluate.json with the SAME
    metric definitions as nerfca_tpu.train.run_eval (image PSNR/SSIM plus
    dyn_psnr/dyn_corr against the artery-only ground-truth projections)."""
    import torch

    from nerfca_tpu.train import evaluation

    dh = sys.modules["data_helpers"]
    mh = sys.modules["model_helpers"]

    data_dir = f"data/{args.data_name}/{args.data_size}/"
    with open(data_dir + "general.json") as f:
        info = json.load(f)
    with open(data_dir + "evaluate.json") as f:
        frames = json.load(f)["frames"]

    static = _load_ref_model(os.path.join(run_dir, "staticmodel-coarse.pth"), mod)
    temp = _load_ref_model(os.path.join(run_dir, "tempmodel-coarse.pth"), mod)

    w, h = (int(v) for v in info["nDetector"])
    device = torch.device("cpu")
    depth_values = dh.create_depth_values(
        info["near_thresh"], info["far_thresh"],
        args.depth_samples_per_ray_coarse, device,
    )
    max_pix = info["max_pixel_value"]
    initial = torch.full((w * h,), max_pix)

    scores = []
    with torch.no_grad():
        for frame in frames:
            origins, dirs = dh.get_ray_values_tigre(
                frame["theta"], frame["phi"], frame["larm"], info, device
            )
            origins = torch.from_numpy(origins).reshape(-1, 3).float()
            dirs = torch.from_numpy(dirs).reshape(-1, 3).float()
            pts = origins[..., None, :] + dirs[..., None, :] * depth_values[..., :, None]
            pts = pts.reshape(-1, 3).float()
            phase = torch.full(
                (w * h * depth_values.shape[0],), float(frame["heart_phase"])
            )
            s_flat, t_flat = mh.get_predictions_composite(
                static, temp, pts, phase, args.batch_size
            )
            shape = (w * h, depth_values.shape[0], 1)
            s_raw = s_flat.reshape(shape)
            t_raw = t_flat.reshape(shape)
            pix, _, _, _ = mh.render_volume_density_composite(
                s_raw, t_raw, initial, dirs, depth_values, args.output_activation
            )
            pix_temp, _, _ = mh.render_volume_density(
                t_raw, initial, dirs, depth_values, args.output_activation
            )

            gt = dh.denormalize_image(
                np.load(frame["file_path"]), w, h, frame["img_min_max"]
            ).astype(np.float32)
            pred = pix.numpy().reshape(w, h)
            psnr = evaluation.image_psnr(pred, gt)
            lo, hi = float(gt.min()), float(gt.max())
            scale = (hi - lo) or 1.0
            ssim = evaluation.image_ssim((pred - lo) / scale, (gt - lo) / scale)
            row = {
                "image_id_str": frame["image_id_str"],
                "theta": frame["theta"],
                "phi": frame["phi"],
                "heart_phase": frame["heart_phase"],
                "psnr": psnr,
                "ssim": ssim,
            }
            dyn_path = frame["file_path"].replace(".npy", "-dyn.npy")
            if os.path.isfile(dyn_path):
                gt_dyn = np.load(dyn_path).reshape((w, h)).T.astype(np.float32)
                pred_dyn = max_pix - pix_temp.numpy().reshape(w, h)
                row["dyn_psnr"] = evaluation.image_psnr(pred_dyn, gt_dyn)
                a = pred_dyn.ravel() - pred_dyn.mean()
                b = gt_dyn.ravel() - gt_dyn.mean()
                denom = float(np.sqrt((a * a).sum() * (b * b).sum()))
                row["dyn_corr"] = float((a * b).sum() / denom) if denom > 0 else 0.0
            scores.append(row)
            extra = (
                f" dyn_psnr={row['dyn_psnr']:.3f} dyn_corr={row['dyn_corr']:.3f}"
                if "dyn_psnr" in row
                else ""
            )
            print(f"[ref eval] {frame['image_id_str']}: psnr={psnr:.3f}{extra}")

    result = {
        "per_view": scores,
        "mean_psnr": float(np.mean([s["psnr"] for s in scores])),
        "mean_ssim": float(np.mean([s["ssim"] for s in scores])),
    }
    dyn_rows = [s for s in scores if "dyn_psnr" in s]
    if dyn_rows:
        result["mean_dyn_psnr"] = float(np.mean([s["dyn_psnr"] for s in dyn_rows]))
        result["mean_dyn_corr"] = float(np.mean([s["dyn_corr"] for s in dyn_rows]))
    return result


# ---------------------------------------------------------------------------
# timing mode (measured PyTorch baseline)
# ---------------------------------------------------------------------------

def time_reference_iterations(mod, recorder: _WandbRecorder) -> dict:
    """Measured iteration rate of the reference trainer on this host's CPU.

    The trainer logs ``train_time`` per iteration (run_composite.py:336);
    running it for a handful of iterations and reading those records times
    the REAL loop — host sampling, chunked forward, losses, backward, Adam —
    not a reimplementation."""
    mod.train()
    times = [r["train_time"] for r in recorder.scalars() if "train_time" in r]
    # drop warmup
    steady = times[max(2, len(times) // 5):]
    sec = float(np.mean(steady))
    return {
        "iters_timed": len(steady),
        "sec_per_iter": sec,
        "it_per_sec": 1.0 / sec,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--time_only", action="store_true")
    ap.add_argument("--out", default=None, help="output json path")
    ap.add_argument("--threads", type=int, default=0,
                    help="torch CPU threads (0 = library default)")
    ns, passthrough = ap.parse_known_args()

    os.chdir(REPO)
    recorder = _WandbRecorder()
    mod = load_reference_trainer(recorder)

    import torch

    if ns.threads:
        torch.set_num_threads(ns.threads)

    # the reference parses sys.argv internally
    sys.argv = ["run_composite.py", "--config", ns.config, *passthrough]
    args = sys.modules["data_helpers"].config_parser().parse_args()

    run_root = f"cases/{args.data_name}/runs/"
    before = set(os.listdir(run_root)) if os.path.isdir(run_root) else set()

    if ns.time_only:
        t0 = time.time()
        result = time_reference_iterations(mod, recorder)
        result["wall_total_sec"] = time.time() - t0
        result["rays_per_sec"] = args.img_sample_size * result["it_per_sec"]
        result["shapes"] = {
            "img_sample_size": args.img_sample_size,
            "depth_samples": args.depth_samples_per_ray_coarse,
            "num_filters": args.static_num_filters,
            "num_early_layers": args.static_num_early_layers,
            "batch_size": args.batch_size,
            "torch_threads": torch.get_num_threads(),
        }
    else:
        t0 = time.time()
        mod.train()
        wall = time.time() - t0
        after = set(os.listdir(run_root))
        new_runs = sorted(after - before)
        run_dir = os.path.join(run_root, new_runs[-1]) if new_runs else None
        result = {"wall_total_sec": wall, "run_dir": run_dir}
        if run_dir and os.path.isfile(
            os.path.join(run_dir, "staticmodel-coarse.pth")
        ):
            result["eval"] = evaluate_reference_run(run_dir, args, mod)
        # trajectory records for the A/B artifact
        if run_dir:
            with open(os.path.join(run_dir, "ref_metrics.jsonl"), "w") as f:
                for row in recorder.scalars():
                    f.write(json.dumps(row) + "\n")

    out = ns.out or (
        "cases/ref_baseline_timing.json" if ns.time_only else
        os.path.join(result.get("run_dir") or "cases", "ref_eval_scores.json")
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "eval"}))
    if "eval" in result:
        ev = result["eval"]
        print(
            f"[ref eval] mean psnr={ev['mean_psnr']:.3f} "
            f"ssim={ev['mean_ssim']:.4f} "
            f"dyn_psnr={ev.get('mean_dyn_psnr', float('nan')):.3f} "
            f"dyn_corr={ev.get('mean_dyn_corr', float('nan')):.3f}"
        )
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
