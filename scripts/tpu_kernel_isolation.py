"""Isolate fused-kernel fwd / fwd+bwd / full-step costs on the TPU.

Round-1 methodology (BENCH.md "Kernel isolation"), re-run after the
round-2 VPU surgery to find the next bottleneck. Measures, at flagship
shapes (512k points, 2 fields 4x128, basis 12):

  - fused forward alone (both fields)
  - forward + backward via value_and_grad of a scalar of the outputs
  - the full composite train step (for the glue remainder)
  - each in f32 and bf16 weight-operand mode

Chains measurements through fresh random inputs each iteration (identical
inputs get deduplicated by the axon executor).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_setup
    from nerfca_tpu.ops.pallas.fused_field import fused_composite_fields_rays

    params, cfgs, hp = _flagship_setup()
    rows = []  # mirrored ledger (campaign /tmp logs do not survive wipes)
    r, s = 1024, 500
    key = jax.random.PRNGKey(0)
    o = jnp.full((r, 3), jnp.asarray([4.5, 0.0, 0.0]))
    d = jax.random.normal(key, (r, 3)) * 0.02 + jnp.asarray([-1.0, 0.0, 0.0])
    z = jnp.broadcast_to(jnp.linspace(3.6, 5.4, s), (r, s))
    ph = jax.random.randint(key, (r,), 0, 10)

    def time_fn(fn, args0, n=30, tag=""):
        # compile
        out = fn(*args0)
        jax.block_until_ready(out)
        # warm the chained-dispatch path untimed: the perturbation
        # tree_map (+1e-9) itself remote-compiles on first use, which
        # previously happened INSIDE the first timed loop and contaminated
        # the first row of the 5e run (fwd-f32 "72.6 ms" = ~2.2 s of
        # one-off compile amortized over 30 calls, while its own fwd+bwd
        # measured 4.41 ms — fwd slower than fwd+bwd is impossible
        # on-device, so the row was compile/tunnel cost, not kernel time)
        warm = (jax.tree.map(lambda x: x + 1e-9, args0[0]), *args0[1:])
        jax.block_until_ready(fn(*warm))
        # chain: perturb an input each call to defeat dedup
        t0 = time.perf_counter()
        carry = args0
        for i in range(n):
            out = fn(*carry)
            carry = (
                jax.tree.map(lambda x: x + 1e-9, carry[0]),
                *carry[1:],
            )
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / n * 1e3
        print(json.dumps({"tag": tag, "ms": round(ms, 3)}))
        rows.append({"tag": tag, "ms": round(ms, 3)})
        return ms

    for dtype in ("float32", "bfloat16"):
        def fwd(ps, pt):
            a, b = fused_composite_fields_rays(
                ps, pt, o, d, z, ph, cfgs["static"], cfgs["temp"],
                None, None, tile=1024, compute_dtype=dtype,
            )
            return a.sum() + b.sum()

        f_j = jax.jit(fwd)
        time_fn(f_j, (params["static"], params["temp"]), tag=f"fwd-{dtype}")

        g_j = jax.jit(jax.grad(lambda ps, pt: fwd(ps, pt), argnums=(0, 1)))
        time_fn(g_j, (params["static"], params["temp"]), tag=f"fwd+bwd-{dtype}")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from ledgers import write_json_mirrored
    write_json_mirrored(rows, "artifacts/round5/kernel_isolation.json")


if __name__ == "__main__":
    main()
