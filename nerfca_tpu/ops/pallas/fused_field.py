"""Fused encode->MLP field evaluation as Pallas TPU kernels with a custom
VJP.

What it fuses (per tile of points, entirely in VMEM):
  windowed positional encoding -> input layer -> hidden ReLU stack ->
  linear density output, for the static and temporal fields TOGETHER
  (sharing the point tile), with all weights resident in VMEM.

Why: the unfused XLA graph round-trips [N, 128] activations through HBM at
every layer boundary of the BACKWARD pass (the residuals), making training
bandwidth-bound at the flagship shapes (N = 512k points/step). The fused
backward recomputes activations per tile in VMEM and accumulates weight
gradients across the sequential TPU grid.

Layout (all HBM-side I/O chosen for COMPACT TPU layouts — this mattered
more than anything else in profiling):
  - Point coordinates arrive FEATURE-MAJOR as one [8, N] array (rows
    x/y/z + padding): TPU tiles f32 arrays as (8, 128), so a [N, 3] array
    physically occupies 128/3 ~ 42x its logical size and a single
    [512k, 3] materialization cost ~2 ms/step in relayout copies. The
    caller never builds [N, 3] points at all — it broadcasts
    origins + z * dirs straight into the [8, N] rows.
  - The per-point time latents are likewise [8, N] (one [10,8]x[8,N]
    matmul from a transposed one-hot; its adjoint is another thin matmul
    instead of a 512k-row scatter).
  - Raw density outputs are written 1-D [N] (T(1024) layout) directly by
    the kernels (a padded [8, N] block would be 28 MB/step of pure-padding
    HBM writes), and the custom-vjp boundary keeps AD from materializing
    padded cotangents.
  - Activations inside VMEM are feature-major [128, T]; every layer is a
    [128, 128] x [128, T] MXU matmul. The band encoding is computed on the
    USED rows only ([rows<=80, T], not 128) via ONE base-frequency
    sin/cos pass plus the exact double-angle recurrence per higher band
    (two FMAs/band instead of a transcendental per row — the kernels are
    VPU-bound on transcendentals, not MXU-bound); when both fields share a
    basis (the flagship case) the encoding is computed once and only the
    per-field annealing window masks differ. Fourier mode keeps the direct
    sin path (arbitrary frequencies).

Supported configs (callers fall back to the jnp path otherwise — see
``pallas_supported``): hidden width 128, no late/skip layers, 1 output
channel, 3 input channels, all four encodings ('none', both windowed
modes, and 'fourier' — a diagonal per-channel scaling that maps onto the
same F/phase machinery with zero raw rows) with encoded width <= 128, and
tile a multiple of 1024 (XLA's 1-D f32 tiling).

Reference math being fused: ``model/CPPN.py:88-135`` +
``model/Temporal.py:113-151`` (encode + MLP), SURVEY §2.1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfca_tpu.models.fields import FieldConfig

WIDTH = 128
GEOM_ROWS = 8  # x, y, z + 5 zero rows (f32 sublane tile)
LAT_ROWS = 8  # latent feature rows (num_time_dim <= 8)
DEFAULT_TILE = 1024

_INTERPRET = False  # flipped by tests on CPU


def pallas_supported(cfg: FieldConfig) -> bool:
    return (
        cfg.num_filters == WIDTH
        and cfg.num_late_layers == 0
        and cfg.num_output_channels == 1
        and cfg.num_input_channels == 3
        and cfg.pos_enc in ("none", "free_windowed", "nerfies_windowed", "fourier")
        and cfg.encoded_features <= WIDTH
        and cfg.num_time_dim <= LAT_ROWS
    )


def _n_raw_rows(cfg: FieldConfig) -> int:
    """Raw-coordinate passthrough rows: 3 for the windowed/plain modes,
    0 for fourier (no passthrough, ``model/CPPN.py:115-118``)."""
    return 0 if cfg.pos_enc == "fourier" else 3


def _enc_rows(cfg: FieldConfig) -> int:
    """Used encoding rows, rounded up to the f32 sublane tile (8). The
    kernels compute the encoding (and its expensive sin pass) on exactly
    these rows instead of the full 128 — at the flagship basis 12 that is
    80 rows vs 128, a 38% cut of the VPU work that dominates the step
    (BENCH.md: the op is VPU-bound on sin, not MXU-bound)."""
    return min(WIDTH, ((cfg.encoded_features + 7) // 8) * 8)


def _enc_spec(cfg: FieldConfig) -> tuple:
    """Static (n_raw, rows, basis) tuple threaded into the kernels."""
    basis = cfg.pos_enc_basis if cfg.pos_enc != "none" else 0
    return (_n_raw_rows(cfg), _enc_rows(cfg), basis)


# ---------------------------------------------------------------------------
# Parameter packing (differentiable jnp; AD maps padded grads back for free)


def _encoding_constants(cfg: FieldConfig, fourier=None):
    """[128, 3] frequency columns + [128, 1] phase offsets (feature-major).

    'fourier' mode is a diagonal per-channel scaling — feature j is
    ``sin(2π coef[j] x_{j%3})`` (``model/CPPN.py:115-118``, the tiled
    elementwise product) — so it maps onto the same F/phase machinery with
    ``2π coef[j]`` at column ``j % 3`` and no raw-passthrough rows."""
    if cfg.pos_enc == "fourier":
        nb = 3 * cfg.pos_enc_basis  # fourier coefficient count
        if fourier is None:
            # zero coefficients: only legitimate for the zero-weight dummy
            # fields used to reuse the composite kernel single-field
            fourier = jnp.zeros((nb,), jnp.float32)
        coef = 2.0 * np.pi * jnp.asarray(fourier, jnp.float32)  # [nb]
        cols = np.zeros((WIDTH, 3), np.float32)
        for j in range(nb):
            cols[j, j % 3] = 1.0  # sin rows
            cols[nb + j, j % 3] = 1.0  # cos rows
        coef_full = jnp.zeros((WIDTH,), jnp.float32)
        coef_full = coef_full.at[:nb].set(coef).at[nb : 2 * nb].set(coef)
        F = jnp.asarray(cols) * coef_full[:, None]
        phase = np.zeros((WIDTH, 1), np.float32)
        phase[nb : 2 * nb, 0] = 0.5 * np.pi
        return F, jnp.asarray(phase)
    basis = cfg.pos_enc_basis if cfg.pos_enc != "none" else 0
    F = np.zeros((WIDTH, 3), np.float32)
    phase = np.zeros((WIDTH, 1), np.float32)
    F[:3, :] = np.eye(3)
    for b in range(basis):
        for c in range(3):
            F[3 + 6 * b + c, c] = 2.0**b  # sin rows
            F[3 + 6 * b + 3 + c, c] = 2.0**b  # cos rows
            phase[3 + 6 * b + 3 + c, 0] = 0.5 * np.pi
    return jnp.asarray(F), jnp.asarray(phase)


def _window_mask(cfg: FieldConfig, window):
    """[128, 1] per-row annealing mask: 1 on raw rows, window[b] on band
    rows, 0 on padding rows. Fourier features are never windowed (the
    reference only anneals the windowed modes)."""
    if cfg.pos_enc == "fourier":
        mask = jnp.zeros((WIDTH,), jnp.float32)
        mask = mask.at[: 6 * cfg.pos_enc_basis].set(1.0)
        return mask[:, None]
    basis = cfg.pos_enc_basis if cfg.pos_enc != "none" else 0
    mask = jnp.zeros((WIDTH,), jnp.float32)
    mask = mask.at[:3].set(1.0)
    if basis > 0:
        w = jnp.ones((basis,), jnp.float32) if window is None else window
        band = jnp.repeat(w, 6)  # [6*basis]: per band, 3 sin + 3 cos rows
        mask = jax.lax.dynamic_update_slice(mask, band.astype(jnp.float32), (3,))
    return mask[:, None]


def _pack_common(params):
    """Hidden stack + output head, transposed to [out, in] for feature-major
    ``W @ h`` matmuls."""
    early = params["early"]
    wh = jnp.stack([l["w"].T for l in early[1:]]) if len(early) > 1 else jnp.zeros(
        (0, WIDTH, WIDTH), jnp.float32
    )
    bh = (
        jnp.stack([l.get("b", jnp.zeros(WIDTH))[:, None] for l in early[1:]])
        if len(early) > 1
        else jnp.zeros((0, WIDTH, 1), jnp.float32)
    )
    wo = jnp.zeros((GEOM_ROWS, WIDTH), jnp.float32).at[0].set(params["out"]["w"][:, 0])
    bo = jnp.zeros((GEOM_ROWS, 1), jnp.float32).at[0, 0].set(
        params["out"].get("b", jnp.zeros(1))[0]
    )
    # wo row 0 as a COLUMN [WIDTH, 1]: the backward's dh = wo^T @ g with a
    # row-0-only cotangent is an outer product, not a matmul — a K=8 MXU
    # pass costs the same column stream as a full K=128 one, so the kernel
    # computes dh as woT * g[0] on the VPU instead. Built directly from the
    # params (no transpose op) so Mosaic never sees a layout change.
    woT = jnp.zeros((WIDTH, 1), jnp.float32).at[:, 0].set(params["out"]["w"][:, 0])
    return wh, bh, wo, bo, woT


def _pack_static(params, cfg: FieldConfig, window):
    F, phase = _encoding_constants(cfg, params.get("fourier"))
    wm = _window_mask(cfg, window)
    enc_width = cfg.encoded_features
    w1 = params["early"][0]["w"]  # [enc_width, 128]
    w1t = jnp.zeros((WIDTH, WIDTH), jnp.float32).at[:, :enc_width].set(
        w1[:enc_width].T
    )
    b1 = params["early"][0].get("b", jnp.zeros(WIDTH))[:, None]
    wh, bh, wo, bo, woT = _pack_common(params)
    return {"F": F, "phase": phase, "wm": jax.lax.stop_gradient(wm),
            "w1": w1t, "b1": b1, "wh": wh, "bh": bh, "wo": wo, "bo": bo,
            "woT": woT}


def _pack_temporal(params, cfg: FieldConfig, window):
    F, phase = _encoding_constants(cfg, params.get("fourier"))
    wm = _window_mask(cfg, window)
    enc_width = cfg.encoded_features
    w1 = params["early"][0]["w"]  # [enc_width + D, 128]
    d = cfg.num_time_dim
    w1t = jnp.zeros((WIDTH, WIDTH), jnp.float32).at[:, :enc_width].set(
        w1[:enc_width].T
    )
    w1l = jnp.zeros((WIDTH, LAT_ROWS), jnp.float32).at[:, :d].set(
        w1[enc_width : enc_width + d].T
    )
    b1 = params["early"][0].get("b", jnp.zeros(WIDTH))[:, None]
    wh, bh, wo, bo, woT = _pack_common(params)
    return {"F": F, "phase": phase, "wm": jax.lax.stop_gradient(wm),
            "w1": w1t, "w1l": w1l, "b1": b1, "wh": wh, "bh": bh,
            "wo": wo, "bo": bo, "woT": woT}


# ---------------------------------------------------------------------------
# Kernels (feature-major: activations [features, T])


def _dot(a, b, dtype):
    return jnp.dot(a.astype(dtype), b.astype(dtype),
                   preferred_element_type=jnp.float32)


def _dotg(a, b, dims, dtype):
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype), dims,
                               preferred_element_type=jnp.float32)


def _encode_base(geom, F, phase, spec):
    """[8, T] geometry rows (x,y,z in rows 0-2) -> [rows, T] unmasked
    encoding. ``spec`` = (n_raw, rows, basis) static per-field tuple; only
    the USED rows (``rows`` = encoded width rounded to the sublane tile)
    are computed — the transcendental pass is the kernel's dominant VPU
    cost and padding rows would waste 40% of it at the flagship basis.

    Two regimes:
      - fourier (n_raw == 0): arbitrary per-row frequencies -> must
        evaluate ``sin`` directly from the F/phase constants;
      - band encodings (n_raw == 3): frequencies are exactly 2^b, so
        ``sin``/``cos`` are evaluated ONCE at the base frequency and every
        higher band comes from the double-angle recurrence
        (sin 2t = 2 sin t cos t, cos 2t = 1 - 2 sin^2 t) — two FMAs per
        band instead of a transcendental per row. The recurrence is exact
        math; float error compounds ~linearly in basis (<=1e-6 absolute at
        basis 12), far inside kernel tolerance.
    """
    n_raw, rows, basis = spec
    if n_raw == 0:
        Fr = F[:rows, :]
        P = (
            Fr[:, 0:1] * geom[0:1, :]
            + Fr[:, 1:2] * geom[1:2, :]
            + Fr[:, 2:3] * geom[2:3, :]
        )
        return jnp.sin(P + phase[:rows, :])

    x = geom[0:3, :]
    pieces = [x]
    if basis > 0:
        s = jnp.sin(x)
        c = jnp.cos(x)
        pieces.append(s)
        pieces.append(c)
        for _ in range(1, basis):
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
            pieces.append(s)
            pieces.append(c)
    used = 3 + 6 * basis
    if rows > used:
        pieces.append(jnp.zeros((rows - used, geom.shape[1]), geom.dtype))
    return jnp.concatenate(pieces, axis=0)


def _both_encodings(geom, fs, phs, wms, ft, pht, wmt, share_enc,
                    spec_s, spec_t):
    """Encodings for both fields; with a shared basis (the flagship case)
    the base transcendental pass runs ONCE and only the window masks
    differ."""
    rows_s, rows_t = spec_s[1], spec_t[1]
    if share_enc:
        base = _encode_base(geom, fs, phs, spec_s)
        return base * wms[:rows_s, :], base * wmt[:rows_t, :]
    return (
        _encode_base(geom, fs, phs, spec_s) * wms[:rows_s, :],
        _encode_base(geom, ft, pht, spec_t) * wmt[:rows_t, :],
    )


def _mlp_forward(enc, w1, b1, wh, bh, wo, bo, lat=None, w1l=None,
                 dtype=jnp.float32, store_dtype=None):
    """Returns (out [8, T], pre-activations list, h list) for backprop.

    ``enc`` may be row-restricted ([rows, T], rows <= 128); the first-layer
    weight is sliced to match (MXU pads the contraction internally).

    ``store_dtype``: dtype for the RESIDUAL ``hs`` list (e.g. bf16 to
    halve the backward's live VMEM). The forward chain itself always runs
    at ``dtype`` matmul semantics — only the stored copies are cast, which
    matches what the dW matmuls' default MXU precision would do to their
    operands anyway."""
    pre1 = _dot(w1[:, : enc.shape[0]], enc, dtype) + b1
    if lat is not None:
        pre1 = pre1 + _dot(w1l, lat, dtype)
    store = (lambda x: x) if store_dtype is None else (
        lambda x: x.astype(store_dtype)
    )
    pres = [pre1]
    h = jnp.maximum(pre1, 0.0)
    hs = [store(h)]
    for l in range(wh.shape[0]):
        pre = _dot(wh[l], h, dtype) + bh[l]
        pres.append(pre)
        h = jnp.maximum(pre, 0.0)
        hs.append(store(h))
    out = _dot(wo, h, dtype) + bo
    return out, pres, hs


def _fwd_kernel(n_hidden_s, n_hidden_t, dtype, share_enc, spec_s, spec_t,
                geom_ref, lat_ref,
                fs, phs, wms, w1s, b1s, whs, bhs, wos, bos, woTs,
                ft, pht, wmt, w1t, w1lt, b1t, wht, bht, wot, bot, woTt,
                out_s, out_t):
    geom = geom_ref[:]
    enc_s, enc_t = _both_encodings(
        geom, fs[:], phs[:], wms[:], ft[:], pht[:], wmt[:], share_enc,
        spec_s, spec_t,
    )
    o_s, _, _ = _mlp_forward(enc_s, w1s[:], b1s[:], whs[:], bhs[:], wos[:],
                             bos[:], dtype=dtype)
    # 1-D [T] output (row 0 is the density) — writing the padded [8, T]
    # block cost 28 MB/step of pure-padding HBM writes
    out_s[:] = o_s[0]
    o_t, _, _ = _mlp_forward(
        enc_t, w1t[:], b1t[:], wht[:], bht[:], wot[:], bot[:],
        lat=lat_ref[:], w1l=w1lt[:], dtype=dtype,
    )
    out_t[:] = o_t[0]


def _field_bwd(g, enc, pres, hs, wh, wo, lat=None, w1l=None,
               dtype=jnp.float32, woT=None):
    """Backprop one field on a tile. ``g``: [8, T] output cotangent
    (row 0 carries the signal).

    Residuals: ``hs`` (post-ReLU activations) is the ONLY per-layer array
    this backward needs — the ReLU masks use ``h > 0``, which equals
    ``pre > 0`` exactly (ReLU(x) > 0 iff x > 0), so the pre-activations
    are dead after the forward and never held across the in-kernel loss
    computation (residual VMEM bounds the viable tile size). ``pres`` is
    accepted for the legacy recompute path: when ``hs`` is None the
    activations are rebuilt from ``pres`` with one ``max`` per layer.

    ``woT``: the output row as a [WIDTH, 1] column. When given, the
    output-layer input-gradient dh = wo^T @ g collapses to the exact outer
    product woT * g[0] (g has a single nonzero row) — a VPU broadcast
    instead of a K=8 MXU pass that costs the same column stream as a full
    K=128 matmul. Bitwise-identical in f32 (single-term sums don't round)."""
    cT = (((1,), (1,)), ((), ()))  # contract along points T
    cF = (((0,), (0,)), ((), ()))  # contract along the out-feature axis
    if hs is None:
        hs = [jnp.maximum(p, 0.0) for p in pres]
    h_of = lambda l: hs[l]  # noqa: E731
    # ReLU mask via an f32 upcast: bf16-stored residuals would otherwise
    # emit a bf16 cmpf, which Mosaic rejects on v5e ("Target does not
    # support this comparison"); the upcast is exact (and a no-op for f32)
    relu_mask = lambda h: h.astype(jnp.float32) > 0  # noqa: E731
    n_hidden = wh.shape[0]
    hL = h_of(n_hidden)
    dwo = _dotg(g, hL, cT, dtype)  # [8, 128]
    dbo = jnp.sum(g, axis=1, keepdims=True)
    if woT is not None:
        # same operand-cast semantics as the matmul it replaces: operands
        # in ``dtype``, product accumulated in f32
        dh = (woT.astype(dtype).astype(jnp.float32)
              * g[0:1, :].astype(dtype).astype(jnp.float32))  # [128, T]
    else:
        dh = _dotg(wo, g, cF, dtype)  # [128, T]
    dwh = []
    dbh = []
    for l in range(n_hidden - 1, -1, -1):
        # ReLU mask from the stored activation: h > 0 iff pre > 0 (exact)
        dpre = dh * relu_mask(hs[l + 1])
        dwh.append(_dotg(dpre, h_of(l), cT, dtype))  # [128, 128]
        dbh.append(jnp.sum(dpre, axis=1, keepdims=True))
        dh = _dotg(wh[l], dpre, cF, dtype)
    dpre1 = dh * relu_mask(hs[0])
    dw1 = _dotg(dpre1, enc, cT, dtype)  # [128, rows]
    rows = enc.shape[0]
    if rows < WIDTH:
        # pad back to the [128, 128] accumulator layout
        dw1 = jnp.pad(dw1, ((0, 0), (0, WIDTH - rows)))
    db1 = jnp.sum(dpre1, axis=1, keepdims=True)
    out = {"wo": dwo, "bo": dbo, "w1": dw1, "b1": db1}
    if n_hidden:
        out["wh"] = jnp.stack(dwh[::-1])
        out["bh"] = jnp.stack(dbh[::-1])
    if lat is not None:
        out["w1l"] = _dotg(dpre1, lat, cT, dtype)  # [128, 8]
        out["dlat"] = _dotg(w1l, dpre1, cF, dtype)  # [8, T]
    return out


def _bwd_kernel(n_hidden_s, n_hidden_t, dtype, share_enc, spec_s, spec_t,
                geom_ref, lat_ref,
                fs, phs, wms, w1s, b1s, whs, bhs, wos, bos, woTs,
                ft, pht, wmt, w1t, w1lt, b1t, wht, bht, wot, bot, woTt,
                gs_ref, gt_ref,
                dlat_ref,
                dw1s_ref, db1s_ref, dwhs_ref, dbhs_ref, dwos_ref, dbos_ref,
                dw1t_ref, dw1lt_ref, db1t_ref, dwht_ref, dbht_ref,
                dwot_ref, dbot_ref):
    geom = geom_ref[:]
    lat = lat_ref[:]
    # incoming cotangents are 1-D [T]; rebuild the padded [8, T] layout in
    # VMEM (row 0 carries the signal, rest zeros)
    row = jax.lax.broadcasted_iota(jnp.int32, (GEOM_ROWS, 1), 0)
    g_s_full = jnp.where(row == 0, gs_ref[:][None, :], 0.0)
    g_t_full = jnp.where(row == 0, gt_ref[:][None, :], 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (dw1s_ref, db1s_ref, dwhs_ref, dbhs_ref, dwos_ref, dbos_ref,
                    dw1t_ref, dw1lt_ref, db1t_ref, dwht_ref, dbht_ref,
                    dwot_ref, dbot_ref):
            ref[:] = jnp.zeros_like(ref)

    # recompute both encodings (shared base pass when eligible)
    enc_s, enc_t = _both_encodings(
        geom, fs[:], phs[:], wms[:], ft[:], pht[:], wmt[:], share_enc,
        spec_s, spec_t,
    )

    # static field: recompute forward, then backprop
    _, _, hs_s = _mlp_forward(enc_s, w1s[:], b1s[:], whs[:], bhs[:],
                              wos[:], bos[:], dtype=dtype)
    g_s = _field_bwd(g_s_full, enc_s, None, hs_s, whs[:], wos[:],
                     dtype=dtype, woT=woTs[:])
    dw1s_ref[:] += g_s["w1"]
    db1s_ref[:] += g_s["b1"]
    if n_hidden_s:
        dwhs_ref[:] += g_s["wh"]
        dbhs_ref[:] += g_s["bh"]
    dwos_ref[:] += g_s["wo"]
    dbos_ref[:] += g_s["bo"]

    # temporal field
    _, _, hs_t = _mlp_forward(
        enc_t, w1t[:], b1t[:], wht[:], bht[:], wot[:], bot[:], lat=lat,
        w1l=w1lt[:], dtype=dtype,
    )
    g_t = _field_bwd(
        g_t_full, enc_t, None, hs_t, wht[:], wot[:], lat=lat,
        w1l=w1lt[:], dtype=dtype, woT=woTt[:],
    )
    dw1t_ref[:] += g_t["w1"]
    dw1lt_ref[:] += g_t["w1l"]
    db1t_ref[:] += g_t["b1"]
    if n_hidden_t:
        dwht_ref[:] += g_t["wh"]
        dbht_ref[:] += g_t["bh"]
    dwot_ref[:] += g_t["wo"]
    dbot_ref[:] += g_t["bo"]
    dlat_ref[:] = g_t["dlat"]


# ---------------------------------------------------------------------------
# pallas_call plumbing


def _rep(shape):
    """Replicated (grid-invariant) full-array block."""
    return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                        memory_space=pltpu.VMEM)


def _fm_tiled(rows, tile):
    """Feature-major [rows, N] array tiled along the point axis."""
    return pl.BlockSpec((rows, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)


def _vec_tiled(tile):
    """1-D [N] array tiled along the point axis."""
    return pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM)


def _pack_specs(pack, with_latent):
    keys = ["F", "phase", "wm", "w1"] + (["w1l"] if with_latent else []) + [
        "b1", "wh", "bh", "wo", "bo", "woT"
    ]
    return [_rep(pack[k].shape) for k in keys], [pack[k] for k in keys]


def _dtype_from_name(name):
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _fused_core(geom, lat, s_pack, t_pack, n_hidden_s, n_hidden_t, tile,
                dtype_name, share_enc, spec_s, spec_t):
    """Returns two [n] raw-density vectors (the kernels write 1-D directly;
    the custom-vjp boundary keeps AD from ever materializing padded
    cotangents). ``spec_s``/``spec_t``: static (n_raw, rows, basis) tuples
    describing each field's encoding."""
    return _fused_core_fwd_impl(
        geom, lat, s_pack, t_pack, n_hidden_s, n_hidden_t, tile, dtype_name,
        share_enc, spec_s, spec_t,
    )


def _fused_core_fwd_impl(geom, lat, s_pack, t_pack, n_hidden_s, n_hidden_t,
                         tile, dtype_name, share_enc, spec_s, spec_t):
    n = geom.shape[1]
    grid = (n // tile,)
    s_specs, s_vals = _pack_specs(s_pack, with_latent=False)
    t_specs, t_vals = _pack_specs(t_pack, with_latent=True)
    kernel = functools.partial(_fwd_kernel, n_hidden_s, n_hidden_t,
                               _dtype_from_name(dtype_name), share_enc,
                               spec_s, spec_t)
    out_s, out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_fm_tiled(GEOM_ROWS, tile), _fm_tiled(LAT_ROWS, tile),
                  *s_specs, *t_specs],
        out_specs=[_vec_tiled(tile), _vec_tiled(tile)],
        out_shape=[jax.ShapeDtypeStruct((n,), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            # forward tiles are independent — 'parallel' lets Mosaic
            # pipeline DMAs more aggressively (the backward keeps
            # 'arbitrary': it accumulates into grid-invariant outputs)
            dimension_semantics=("parallel",),
        ),
        interpret=_INTERPRET,
    )(geom, lat, *s_vals, *t_vals)
    return out_s, out_t


def _fused_core_fwd(geom, lat, s_pack, t_pack, n_hidden_s, n_hidden_t,
                    tile, dtype_name, share_enc, spec_s, spec_t):
    out_s, out_t = _fused_core_fwd_impl(
        geom, lat, s_pack, t_pack, n_hidden_s, n_hidden_t, tile, dtype_name,
        share_enc, spec_s, spec_t,
    )
    return (out_s, out_t), (geom, lat, s_pack, t_pack)


def _fused_core_bwd(n_hidden_s, n_hidden_t, tile, dtype_name, share_enc,
                    spec_s, spec_t, residuals, gouts):
    geom, lat, s_pack, t_pack = residuals
    g_s, g_t = gouts
    n = geom.shape[1]
    grid = (n // tile,)
    s_specs, s_vals = _pack_specs(s_pack, with_latent=False)
    t_specs, t_vals = _pack_specs(t_pack, with_latent=True)

    wh_s_shape = s_pack["wh"].shape
    bh_s_shape = s_pack["bh"].shape
    wh_t_shape = t_pack["wh"].shape
    bh_t_shape = t_pack["bh"].shape

    out_shapes = [
        jax.ShapeDtypeStruct((LAT_ROWS, n), jnp.float32),  # dlat
        jax.ShapeDtypeStruct((WIDTH, WIDTH), jnp.float32),  # dw1s
        jax.ShapeDtypeStruct((WIDTH, 1), jnp.float32),  # db1s
        jax.ShapeDtypeStruct(wh_s_shape, jnp.float32),
        jax.ShapeDtypeStruct(bh_s_shape, jnp.float32),
        jax.ShapeDtypeStruct((GEOM_ROWS, WIDTH), jnp.float32),  # dwos
        jax.ShapeDtypeStruct((GEOM_ROWS, 1), jnp.float32),  # dbos
        jax.ShapeDtypeStruct((WIDTH, WIDTH), jnp.float32),  # dw1t
        jax.ShapeDtypeStruct((WIDTH, LAT_ROWS), jnp.float32),  # dw1lt
        jax.ShapeDtypeStruct((WIDTH, 1), jnp.float32),  # db1t
        jax.ShapeDtypeStruct(wh_t_shape, jnp.float32),
        jax.ShapeDtypeStruct(bh_t_shape, jnp.float32),
        jax.ShapeDtypeStruct((GEOM_ROWS, WIDTH), jnp.float32),  # dwot
        jax.ShapeDtypeStruct((GEOM_ROWS, 1), jnp.float32),  # dbot
    ]
    out_specs = [
        _fm_tiled(LAT_ROWS, tile),
        _rep((WIDTH, WIDTH)),
        _rep((WIDTH, 1)),
        _rep(wh_s_shape),
        _rep(bh_s_shape),
        _rep((GEOM_ROWS, WIDTH)),
        _rep((GEOM_ROWS, 1)),
        _rep((WIDTH, WIDTH)),
        _rep((WIDTH, LAT_ROWS)),
        _rep((WIDTH, 1)),
        _rep(wh_t_shape),
        _rep(bh_t_shape),
        _rep((GEOM_ROWS, WIDTH)),
        _rep((GEOM_ROWS, 1)),
    ]
    kernel = functools.partial(_bwd_kernel, n_hidden_s, n_hidden_t,
                               _dtype_from_name(dtype_name), share_enc,
                               spec_s, spec_t)
    (dlat, dw1s, db1s, dwhs, dbhs, dwos, dbos,
     dw1t, dw1lt, db1t, dwht, dbht, dwot, dbot) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_fm_tiled(GEOM_ROWS, tile), _fm_tiled(LAT_ROWS, tile),
                  *s_specs, *t_specs,
                  _vec_tiled(tile), _vec_tiled(tile)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(geom, lat, *s_vals, *t_vals, g_s, g_t)

    zero = jnp.zeros_like
    # woT gets a ZERO cotangent: it is the same parameter as wo's row 0,
    # used only as a backward-pass constant — dL/dwo is fully carried by
    # the "wo" entry (dwo = g @ hL^T), so routing anything through woT
    # would double-count.
    ds_pack = {"F": zero(s_pack["F"]), "phase": zero(s_pack["phase"]),
               "wm": zero(s_pack["wm"]), "w1": dw1s, "b1": db1s,
               "wh": dwhs, "bh": dbhs, "wo": dwos, "bo": dbos,
               "woT": zero(s_pack["woT"])}
    dt_pack = {"F": zero(t_pack["F"]), "phase": zero(t_pack["phase"]),
               "wm": zero(t_pack["wm"]), "w1": dw1t, "w1l": dw1lt,
               "b1": db1t, "wh": dwht, "bh": dbht, "wo": dwot, "bo": dbot,
               "woT": zero(t_pack["woT"])}
    return jnp.zeros_like(geom), dlat, ds_pack, dt_pack


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# ---------------------------------------------------------------------------
# Public API


def _build_geometry_rows(origins, directions, z_rs, tile):
    """[R,3] origins/dirs + [R,S] depths -> compact [8, N] coordinate rows
    (plus the padded point count). Never materializes [N, 3]."""
    r, s = z_rs.shape
    n = r * s
    rows = [
        (origins[:, c : c + 1] + z_rs * directions[:, c : c + 1]).reshape(n)
        for c in range(3)
    ]
    geom = jnp.stack(
        rows + [jnp.zeros((n,), rows[0].dtype)] * (GEOM_ROWS - 3), axis=0
    )
    pad = (-n) % tile
    if pad:
        geom = jnp.concatenate(
            [geom, jnp.zeros((GEOM_ROWS, pad), geom.dtype)], axis=1
        )
    return jax.lax.stop_gradient(geom), n, pad


def fused_composite_fields_rays(
    params_s,
    params_t,
    origins,
    directions,
    z_rs,
    ray_phases,
    cfg_s: FieldConfig,
    cfg_t: FieldConfig,
    window_s,
    window_t,
    tile: int = DEFAULT_TILE,
    compute_dtype: str = "float32",
):
    """Ray-form entry point: ``origins/directions [R, 3]``, per-ray depths
    ``z_rs [R, S]``, integer ``ray_phases [R]`` -> two ``[R, S, 1]`` raw
    density tensors. Avoids ever materializing ``[R*S, 3]`` points (which
    would take a 42x-padded TPU layout). Differentiable w.r.t. both param
    pytrees; the ray geometry is treated as constant.
    """
    if not (pallas_supported(cfg_s) and pallas_supported(cfg_t)):
        raise ValueError("config not supported by the fused kernel")
    r, s = z_rs.shape
    geom, n, pad = _build_geometry_rows(origins, directions, z_rs, tile)

    # per-point latents, feature-major [8, N]: latents^T @ onehot^T as one
    # thin matmul (adjoint is another matmul, not a 512k-row scatter)
    phases_pt = jnp.broadcast_to(
        ray_phases.astype(jnp.int32)[:, None], (r, s)
    ).reshape(n)
    onehot = jax.nn.one_hot(
        phases_pt, params_t["latents"].shape[0], dtype=jnp.float32
    )  # [n, P]
    lat_fm = jax.lax.dot_general(
        params_t["latents"], onehot, (((0,), (1,)), ((), ()))
    )  # [D, n]
    d = lat_fm.shape[0]
    if d < LAT_ROWS:
        lat_fm = jnp.concatenate(
            [lat_fm, jnp.zeros((LAT_ROWS - d, n), lat_fm.dtype)], axis=0
        )
    if pad:
        lat_fm = jnp.concatenate(
            [lat_fm, jnp.zeros((LAT_ROWS, pad), lat_fm.dtype)], axis=1
        )

    s_pack = _pack_static(params_s, cfg_s, window_s)
    t_pack = _pack_temporal(params_t, cfg_t, window_t)
    if compute_dtype == "bfloat16":
        s_pack, t_pack = _cast_weight_packs(s_pack), _cast_weight_packs(t_pack)
    out_s, out_t = _fused_core(
        geom, lat_fm, s_pack, t_pack,
        cfg_s.num_early_layers, cfg_t.num_early_layers, tile, compute_dtype,
        _share_enc(cfg_s, cfg_t), _enc_spec(cfg_s), _enc_spec(cfg_t),
    )
    return out_s[:n].reshape(r, s, 1), out_t[:n].reshape(r, s, 1)


def _share_enc(cfg_s: FieldConfig, cfg_t: FieldConfig) -> bool:
    """One sin pass serves both fields when their frequency bases are
    identical. Fourier bases are drawn per field, so never shared."""
    return (
        cfg_s.pos_enc_basis == cfg_t.pos_enc_basis
        and (cfg_s.pos_enc == "none") == (cfg_t.pos_enc == "none")
        and cfg_s.pos_enc != "fourier"
        and cfg_t.pos_enc != "fourier"
    )


def _cast_weight_packs(pack):
    """bf16 weight operands (MXU-native mode); biases/encoding constants
    stay f32. The cast sits outside the custom-vjp boundary, so AD maps the
    f32 gradients back automatically."""
    out = dict(pack)
    for k in ("w1", "w1l", "wh", "wo", "woT"):
        if k in out:
            out[k] = out[k].astype(jnp.bfloat16)
    return out


def fused_composite_fields(
    params_s,
    params_t,
    points,
    point_phases,
    cfg_s: FieldConfig,
    cfg_t: FieldConfig,
    window_s,
    window_t,
    tile: int = DEFAULT_TILE,
    compute_dtype: str = "float32",
):
    """Point-form entry (compat with the jnp field API): ``points [R, S, 3]``
    and per-point ``point_phases [R, S]``. Prefer
    :func:`fused_composite_fields_rays` in hot paths — this form has to
    unpack the already-materialized points into the compact row layout."""
    if not (pallas_supported(cfg_s) and pallas_supported(cfg_t)):
        raise ValueError("config not supported by the fused kernel")
    r, s, _ = points.shape
    # decompose into the ray form: origins=0, dirs pattern unused; feed the
    # coordinate rows directly
    n = r * s
    pad = (-n) % tile
    x = jax.lax.stop_gradient(points.reshape(n, 3))
    rows = [x[:, c] for c in range(3)]
    geom = jnp.stack(
        rows + [jnp.zeros((n,), x.dtype)] * (GEOM_ROWS - 3), axis=0
    )
    if pad:
        geom = jnp.concatenate(
            [geom, jnp.zeros((GEOM_ROWS, pad), geom.dtype)], axis=1
        )

    phases_pt = point_phases.reshape(n).astype(jnp.int32)
    onehot = jax.nn.one_hot(
        phases_pt, params_t["latents"].shape[0], dtype=jnp.float32
    )
    lat_fm = jax.lax.dot_general(
        params_t["latents"], onehot, (((0,), (1,)), ((), ()))
    )
    d = lat_fm.shape[0]
    if d < LAT_ROWS:
        lat_fm = jnp.concatenate(
            [lat_fm, jnp.zeros((LAT_ROWS - d, n), lat_fm.dtype)], axis=0
        )
    if pad:
        lat_fm = jnp.concatenate(
            [lat_fm, jnp.zeros((LAT_ROWS, pad), lat_fm.dtype)], axis=1
        )

    s_pack = _pack_static(params_s, cfg_s, window_s)
    t_pack = _pack_temporal(params_t, cfg_t, window_t)
    if compute_dtype == "bfloat16":
        s_pack, t_pack = _cast_weight_packs(s_pack), _cast_weight_packs(t_pack)
    out_s, out_t = _fused_core(
        geom, lat_fm, s_pack, t_pack,
        cfg_s.num_early_layers, cfg_t.num_early_layers, tile, compute_dtype,
        _share_enc(cfg_s, cfg_t), _enc_spec(cfg_s), _enc_spec(cfg_t),
    )
    return out_s[:n].reshape(r, s, 1), out_t[:n].reshape(r, s, 1)


def fused_static_field(params, points, cfg: FieldConfig, window,
                       tile: int = DEFAULT_TILE, compute_dtype: str = "float32"):
    """Single-field fused evaluation (run_nerf path): ``[R, S, 3] ->
    [R, S, 1]``. Reuses the composite kernel with a zero dummy temporal
    field to keep one code path."""
    if not pallas_supported(cfg):
        raise ValueError("config not supported by the fused kernel")
    import dataclasses

    dummy = {
        "early": [{"w": jnp.zeros((cfg.encoded_features + LAT_ROWS, WIDTH)),
                   "b": jnp.zeros(WIDTH)}]
        + [{"w": jnp.zeros((WIDTH, WIDTH)), "b": jnp.zeros(WIDTH)}
           for _ in range(cfg.num_early_layers)],
        "out": {"w": jnp.zeros((WIDTH, 1)), "b": jnp.zeros(1)},
        "latents": jnp.zeros((10, LAT_ROWS)),
    }
    dummy_cfg = dataclasses.replace(cfg, use_time_latents=True, num_time_dim=LAT_ROWS)
    phases = jnp.zeros(points.shape[:2], jnp.int32)
    raw_s, _ = fused_composite_fields(
        params, dummy, points, phases, cfg, dummy_cfg, window, window,
        tile, compute_dtype,
    )
    return raw_s
