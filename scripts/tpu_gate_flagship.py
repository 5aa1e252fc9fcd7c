"""One-off flagship-shape hardware gate for the fused train kernel.

``bench.py``'s per-run gate checks the kernel at small shapes / tile 1024
(the rt=32 tiling that tile 4096 implies at those shapes exceeds the
remote tunnel's compile budget). This closes the residual caveat: it runs
the SAME fused-vs-XLA loss+grad agreement check at the flagship shapes
(1024 rays x 500 samples) with the shipping tile-4096 / raised-VMEM
configuration — i.e. the exact graph the timed bench path runs — against
a host-CPU XLA reference (f32 loss ref, bf16-operand grad ref, same
tolerance rationale as bench.py).

Writes ``artifacts/gate_flagship.json``. Run on TPU (several minutes of
remote compile).
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_setup
    from nerfca_tpu.ops.sampling import linspace_depths
    from nerfca_tpu.train.step import composite_loss_fn, field_window, loss_weights
    from nerfca_tpu.ops.pallas.fused_train import fused_train_loss_and_grads

    assert jax.default_backend() != "cpu", "run on TPU"
    params, cfgs, hp = _flagship_setup()
    r, s = hp.img_sample_size, hp.depth_samples_coarse  # flagship 1024x500
    hp_fused = dataclasses.replace(
        hp, use_pallas=True, use_fused_loss=True,
        pallas_tile=4096, pallas_vmem_mb=100,
    )
    hp_ref = dataclasses.replace(hp_fused, use_pallas=False)

    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 3)
    batch = {
        "origins": jnp.full((r, 3), jnp.asarray([4.5, 0.0, 0.0])),
        "directions": jax.random.normal(ks[0], (r, 3)) * 0.02
        + jnp.asarray([-1.0, 0.0, 0.0]),
        "pixels": jax.random.uniform(ks[1], (r,)) * 0.05 + 2.1,
        "weights": jnp.ones((r,)),
        "phases": jax.random.randint(ks[2], (r,), 0, 10),
        "initial_intensities": jnp.full((r,), 2.16),
    }
    z = linspace_depths(3.6, 5.4, s)
    step = jnp.asarray(1234, jnp.int32)

    def make(hp_x):
        def loss(p):
            return composite_loss_fn(p, batch, z, step, cfgs, hp_x)[0]

        return jax.jit(jax.value_and_grad(loss))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params_cpu = jax.device_put(params, cpu)
        lr_, _ = make(hp_ref)(params_cpu)
        hp_ref16 = dataclasses.replace(hp_ref, compute_dtype="bfloat16")
        _, gr = make(hp_ref16)(params_cpu)

    windows = {
        "static": field_window(cfgs["static"], step),
        "temp": field_window(cfgs["temp"], step),
    }
    w = loss_weights(step, hp_fused)
    lw = jnp.stack([w["favor_s"], w["dynamic_entro"], w["occl"], w["l1"]])

    @jax.jit
    def fused_loss_grads(p):
        loss, _, g_s, g_t = fused_train_loss_and_grads(
            p["static"], p["temp"], batch["origins"], batch["directions"],
            z, batch["phases"], batch["pixels"], batch["weights"],
            batch["initial_intensities"], cfgs["static"], cfgs["temp"],
            windows["static"], windows["temp"], lw, hp_fused,
        )
        return loss, {"static": g_s, "temp": g_t}

    t0 = time.time()
    lm, gm = fused_loss_grads(params)
    jax.block_until_ready(lm)
    compile_wall = time.time() - t0

    # identical tolerance logic to bench.py's gate (see the rationale
    # comments there)
    lf, lr_f = float(lm), float(lr_)
    assert abs(lf - lr_f) <= 1e-3 * max(abs(lr_f), 1e-6), (
        f"flagship LOSS divergence: {lf} vs {lr_f}"
    )
    flat_f = jax.tree_util.tree_flatten_with_path(gm)[0]
    flat_r = jax.tree.leaves(gr)
    gmax = max(float(np.abs(np.asarray(b)).max()) for b in flat_r)
    worst = 0.0
    for (path, a), b in zip(flat_f, flat_r):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(float(np.abs(b).max()), 1e-2 * gmax, 1e-8)
        err = float(np.abs(a - b).max()) / scale
        worst = max(worst, err)
        assert err < 2e-2, (
            f"flagship GRAD divergence at {jax.tree_util.keystr(path)}: {err:.2e}"
        )

    out = {
        "gate": "flagship-tile4096",
        "rays": r, "samples": s, "pallas_tile": 4096, "vmem_mb": 100,
        "loss_fused": lf, "loss_ref": lr_f,
        "worst_grad_rel_err": worst,
        "compile_plus_first_step_sec": round(compile_wall, 1),
        "result": "ok",
    }
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/gate_flagship.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
