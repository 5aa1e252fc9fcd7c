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
gradients across the sequential TPU grid — measured ~1.8x faster than XLA's
autodiff for the same math on v5e.

Layout: POINT-MAJOR ([points, features]) so input tiles slice straight out
of the flattened ``[N, 3]`` point array with no host-side transpose. The
encoding is computed AS A MATMUL: ``x @ F [3, 128]`` maps each point to
per-band phases, one ``sin`` with a per-lane phase offset produces sin/cos
features, a per-lane mask applies the annealing window, and lanes < 3 pass
the raw coordinates through (selected by lane index). First-layer weights
are zero-padded from the encoded width (3 + 6*basis) to 128; the masked
lanes contribute nothing. Every layer is then a ``[T, 128] x [128, 128]``
MXU matmul.

Supported configs (callers fall back to the jnp path otherwise — see
``pallas_supported``): hidden width 128, no late/skip layers, 1 output
channel, 3 input channels, windowed or 'none' encodings with
3 + 6*basis <= 128.

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
OUT_PAD = 8  # output/latent feature lanes padded to the f32 sublane tile
DEFAULT_TILE = 1024

_INTERPRET = False  # flipped by tests on CPU


def pallas_supported(cfg: FieldConfig) -> bool:
    return (
        cfg.num_filters == WIDTH
        and cfg.num_late_layers == 0
        and cfg.num_output_channels == 1
        and cfg.num_input_channels == 3
        and cfg.pos_enc in ("none", "free_windowed", "nerfies_windowed")
        and 3 + 6 * cfg.pos_enc_basis <= WIDTH
    )


# ---------------------------------------------------------------------------
# Parameter packing (differentiable jnp; AD maps padded grads back for free)


def _encoding_constants(cfg: FieldConfig):
    """Static [3, 128] frequency matrix + [1, 128] phase offsets."""
    basis = cfg.pos_enc_basis if cfg.pos_enc != "none" else 0
    F = np.zeros((3, WIDTH), np.float32)
    phase = np.zeros((1, WIDTH), np.float32)
    F[:, :3] = np.eye(3)
    for b in range(basis):
        for c in range(3):
            F[c, 3 + 6 * b + c] = 2.0**b  # sin lanes
            F[c, 3 + 6 * b + 3 + c] = 2.0**b  # cos lanes
            phase[0, 3 + 6 * b + 3 + c] = 0.5 * np.pi
    return jnp.asarray(F), jnp.asarray(phase)


def _window_mask(cfg: FieldConfig, window):
    """[1, 128] per-lane annealing mask: 1 on raw lanes, window[b] on band
    lanes, 0 on padding lanes."""
    basis = cfg.pos_enc_basis if cfg.pos_enc != "none" else 0
    mask = jnp.zeros((WIDTH,), jnp.float32)
    mask = mask.at[:3].set(1.0)
    if basis > 0:
        w = jnp.ones((basis,), jnp.float32) if window is None else window
        band = jnp.repeat(w, 6)  # [6*basis]: per band, 3 sin + 3 cos lanes
        mask = jax.lax.dynamic_update_slice(mask, band.astype(jnp.float32), (3,))
    return mask[None, :]


def _pack_common(params):
    """Hidden stack + output head in natural [in, out] layout."""
    early = params["early"]
    wh = jnp.stack([l["w"] for l in early[1:]]) if len(early) > 1 else jnp.zeros(
        (0, WIDTH, WIDTH), jnp.float32
    )
    bh = (
        jnp.stack([l.get("b", jnp.zeros(WIDTH))[None, :] for l in early[1:]])
        if len(early) > 1
        else jnp.zeros((0, 1, WIDTH), jnp.float32)
    )
    wo = jnp.zeros((WIDTH, OUT_PAD), jnp.float32).at[:, 0].set(params["out"]["w"][:, 0])
    bo = jnp.zeros((1, OUT_PAD), jnp.float32).at[0, 0].set(
        params["out"].get("b", jnp.zeros(1))[0]
    )
    return wh, bh, wo, bo


def _pack_static(params, cfg: FieldConfig, window):
    F, phase = _encoding_constants(cfg)
    wm = _window_mask(cfg, window)
    enc_width = 3 + 6 * (cfg.pos_enc_basis if cfg.pos_enc != "none" else 0)
    w1 = params["early"][0]["w"]  # [enc_width, 128]
    w1p = jnp.zeros((WIDTH, WIDTH), jnp.float32).at[:enc_width].set(w1[:enc_width])
    b1 = params["early"][0].get("b", jnp.zeros(WIDTH))[None, :]
    wh, bh, wo, bo = _pack_common(params)
    return {"F": F, "phase": phase, "wm": jax.lax.stop_gradient(wm),
            "w1": w1p, "b1": b1, "wh": wh, "bh": bh, "wo": wo, "bo": bo}


def _pack_temporal(params, cfg: FieldConfig, window):
    F, phase = _encoding_constants(cfg)
    wm = _window_mask(cfg, window)
    enc_width = 3 + 6 * (cfg.pos_enc_basis if cfg.pos_enc != "none" else 0)
    w1 = params["early"][0]["w"]  # [enc_width + D, 128]
    d = cfg.num_time_dim
    w1p = jnp.zeros((WIDTH, WIDTH), jnp.float32).at[:enc_width].set(w1[:enc_width])
    w1l = jnp.zeros((OUT_PAD, WIDTH), jnp.float32).at[:d].set(
        w1[enc_width : enc_width + d]
    )
    b1 = params["early"][0].get("b", jnp.zeros(WIDTH))[None, :]
    wh, bh, wo, bo = _pack_common(params)
    return {"F": F, "phase": phase, "wm": jax.lax.stop_gradient(wm),
            "w1": w1p, "w1l": w1l, "b1": b1, "wh": wh, "bh": bh,
            "wo": wo, "bo": bo}


# ---------------------------------------------------------------------------
# Kernels (point-major: activations [T, features])


def _dot(a, b, dtype):
    """Matmul in the compute dtype with f32 accumulation."""
    return jnp.dot(a.astype(dtype), b.astype(dtype),
                   preferred_element_type=jnp.float32)


def _dotg(a, b, dims, dtype):
    return jax.lax.dot_general(a.astype(dtype), b.astype(dtype), dims,
                               preferred_element_type=jnp.float32)


def _encode_base(x, F, phase):
    """[T, 3] points -> [T, 128] unmasked encoding (raw lanes + sin/cos)."""
    P = jnp.dot(x, F, preferred_element_type=jnp.float32)  # [T, 128]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, WIDTH), 1)
    return jnp.where(lane < 3, P, jnp.sin(P + phase))


def _encode(x, F, phase, wm):
    """Masked encoding for one field."""
    return _encode_base(x, F, phase) * wm


def _mlp_forward(enc, w1, b1, wh, bh, wo, bo, lat=None, w1l=None,
                 dtype=jnp.float32):
    """Returns (out [T, 8], pre-activations list, h list) for backprop."""
    pre1 = _dot(enc, w1, dtype) + b1
    if lat is not None:
        pre1 = pre1 + _dot(lat, w1l, dtype)
    pres = [pre1]
    h = jnp.maximum(pre1, 0.0)
    hs = [h]
    for l in range(wh.shape[0]):
        pre = _dot(h, wh[l], dtype) + bh[l]
        pres.append(pre)
        h = jnp.maximum(pre, 0.0)
        hs.append(h)
    out = _dot(h, wo, dtype) + bo
    return out, pres, hs


def _both_encodings(x, fs, phs, wms, ft, pht, wmt, share_enc):
    """Encodings for both fields; when they share (F, phase) — same basis
    and mode, the flagship case — the expensive sin pass runs ONCE and only
    the per-field window masks differ (the sin is VPU-bound and dominates
    the forward kernel)."""
    if share_enc:
        base = _encode_base(x, fs, phs)
        return base * wms, base * wmt
    return _encode(x, fs, phs, wms), _encode(x, ft, pht, wmt)


def _fwd_kernel(n_hidden_s, n_hidden_t, dtype, share_enc,
                x_ref, lat_ref,
                fs, phs, wms, w1s, b1s, whs, bhs, wos, bos,
                ft, pht, wmt, w1t, w1lt, b1t, wht, bht, wot, bot,
                out_s, out_t):
    x = x_ref[:]
    enc_s, enc_t = _both_encodings(
        x, fs[:], phs[:], wms[:], ft[:], pht[:], wmt[:], share_enc
    )
    o_s, _, _ = _mlp_forward(enc_s, w1s[:], b1s[:], whs[:], bhs[:], wos[:],
                             bos[:], dtype=dtype)
    out_s[:] = o_s
    o_t, _, _ = _mlp_forward(
        enc_t, w1t[:], b1t[:], wht[:], bht[:], wot[:], bot[:],
        lat=lat_ref[:], w1l=w1lt[:], dtype=dtype,
    )
    out_t[:] = o_t


def _field_bwd(g, enc, pres, hs, wh, wo, lat=None, w1l=None,
               dtype=jnp.float32):
    """Backprop one field on a tile. ``g``: [T, 8] output cotangent."""
    cT = (((0,), (0,)), ((), ()))  # contract along points T
    cF = (((1,), (1,)), ((), ()))  # contract along the out-feature axis
    hL = hs[-1]
    dwo = _dotg(hL, g, cT, dtype)  # [128, 8]
    dbo = jnp.sum(g, axis=0, keepdims=True)
    dh = _dotg(g, wo, cF, dtype)  # [T, 128]
    n_hidden = wh.shape[0]
    dwh = []
    dbh = []
    for l in range(n_hidden - 1, -1, -1):
        dpre = dh * (pres[l + 1] > 0)
        dwh.append(_dotg(hs[l], dpre, cT, dtype))  # [128, 128]
        dbh.append(jnp.sum(dpre, axis=0, keepdims=True))
        dh = _dotg(dpre, wh[l], cF, dtype)
    dpre1 = dh * (pres[0] > 0)
    dw1 = _dotg(enc, dpre1, cT, dtype)  # [128, 128]
    db1 = jnp.sum(dpre1, axis=0, keepdims=True)
    out = {"wo": dwo, "bo": dbo, "w1": dw1, "b1": db1}
    if n_hidden:
        out["wh"] = jnp.stack(dwh[::-1])
        out["bh"] = jnp.stack(dbh[::-1])
    if lat is not None:
        out["w1l"] = _dotg(lat, dpre1, cT, dtype)  # [8, 128]
        out["dlat"] = _dotg(dpre1, w1l, cF, dtype)  # [T, 8]
    return out


def _bwd_kernel(n_hidden_s, n_hidden_t, dtype, share_enc,
                x_ref, lat_ref,
                fs, phs, wms, w1s, b1s, whs, bhs, wos, bos,
                ft, pht, wmt, w1t, w1lt, b1t, wht, bht, wot, bot,
                gs_ref, gt_ref,
                dlat_ref,
                dw1s_ref, db1s_ref, dwhs_ref, dbhs_ref, dwos_ref, dbos_ref,
                dw1t_ref, dw1lt_ref, db1t_ref, dwht_ref, dbht_ref,
                dwot_ref, dbot_ref):
    x = x_ref[:]
    lat = lat_ref[:]
    # incoming cotangents are [T] (the core returns 1-D); rebuild the padded
    # [T, 8] layout in VMEM (column 0 carries the signal, rest zeros)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, OUT_PAD), 1)
    g_s_full = jnp.where(lane == 0, gs_ref[:][:, None], 0.0)
    g_t_full = jnp.where(lane == 0, gt_ref[:][:, None], 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (dw1s_ref, db1s_ref, dwhs_ref, dbhs_ref, dwos_ref, dbos_ref,
                    dw1t_ref, dw1lt_ref, db1t_ref, dwht_ref, dbht_ref,
                    dwot_ref, dbot_ref):
            ref[:] = jnp.zeros_like(ref)

    # recompute both encodings (shared sin pass when eligible)
    enc_s, enc_t = _both_encodings(
        x, fs[:], phs[:], wms[:], ft[:], pht[:], wmt[:], share_enc
    )

    # static field: recompute forward, then backprop
    _, pres_s, hs_s = _mlp_forward(enc_s, w1s[:], b1s[:], whs[:], bhs[:],
                                   wos[:], bos[:], dtype=dtype)
    g_s = _field_bwd(g_s_full, enc_s, pres_s, hs_s, whs[:], wos[:],
                     dtype=dtype)
    dw1s_ref[:] += g_s["w1"]
    db1s_ref[:] += g_s["b1"]
    if n_hidden_s:
        dwhs_ref[:] += g_s["wh"]
        dbhs_ref[:] += g_s["bh"]
    dwos_ref[:] += g_s["wo"]
    dbos_ref[:] += g_s["bo"]

    # temporal field
    _, pres_t, hs_t = _mlp_forward(
        enc_t, w1t[:], b1t[:], wht[:], bht[:], wot[:], bot[:], lat=lat,
        w1l=w1lt[:], dtype=dtype,
    )
    g_t = _field_bwd(
        g_t_full, enc_t, pres_t, hs_t, wht[:], wot[:], lat=lat,
        w1l=w1lt[:], dtype=dtype,
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


def _tiled(tile, *feature_dims):
    shape = (tile, *feature_dims)
    return pl.BlockSpec(shape, lambda i: (i, *(0 for _ in feature_dims)),
                        memory_space=pltpu.VMEM)


def _pack_specs(pack, with_latent):
    keys = ["F", "phase", "wm", "w1"] + (["w1l"] if with_latent else []) + [
        "b1", "wh", "bh", "wo", "bo"
    ]
    return [_rep(pack[k].shape) for k in keys], [pack[k] for k in keys]


def _dtype_from_name(name):
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused_core(x, lat, s_pack, t_pack, n_hidden_s, n_hidden_t, tile,
                dtype_name, share_enc):
    """Returns two [n] raw-density vectors. The column-0 slice of the padded
    kernel outputs happens INSIDE this custom-vjp boundary so its adjoint is
    never built — AD of an outside slice materializes two [n, 8] zero-pads
    (~1.6 ms/step at flagship shapes, measured in the device trace)."""
    out_s, out_t = _fused_core_fwd_impl(
        x, lat, s_pack, t_pack, n_hidden_s, n_hidden_t, tile, dtype_name,
        share_enc,
    )
    return out_s[:, 0], out_t[:, 0]


def _fused_core_fwd_impl(x, lat, s_pack, t_pack, n_hidden_s, n_hidden_t,
                         tile, dtype_name, share_enc):
    n = x.shape[0]
    grid = (n // tile,)
    s_specs, s_vals = _pack_specs(s_pack, with_latent=False)
    t_specs, t_vals = _pack_specs(t_pack, with_latent=True)
    kernel = functools.partial(_fwd_kernel, n_hidden_s, n_hidden_t,
                               _dtype_from_name(dtype_name), share_enc)
    out_s, out_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_tiled(tile, 3), _tiled(tile, OUT_PAD), *s_specs, *t_specs],
        out_specs=[_tiled(tile, OUT_PAD), _tiled(tile, OUT_PAD)],
        out_shape=[jax.ShapeDtypeStruct((n, OUT_PAD), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(x, lat, *s_vals, *t_vals)
    return out_s, out_t


def _fused_core_fwd(x, lat, s_pack, t_pack, n_hidden_s, n_hidden_t,
                    tile, dtype_name, share_enc):
    out_s, out_t = _fused_core_fwd_impl(
        x, lat, s_pack, t_pack, n_hidden_s, n_hidden_t, tile, dtype_name,
        share_enc,
    )
    return (out_s[:, 0], out_t[:, 0]), (x, lat, s_pack, t_pack)


def _fused_core_bwd(n_hidden_s, n_hidden_t, tile, dtype_name, share_enc,
                    residuals, gouts):
    x, lat, s_pack, t_pack = residuals
    g_s, g_t = gouts
    n = x.shape[0]
    grid = (n // tile,)
    s_specs, s_vals = _pack_specs(s_pack, with_latent=False)
    t_specs, t_vals = _pack_specs(t_pack, with_latent=True)

    wh_s_shape = s_pack["wh"].shape
    bh_s_shape = s_pack["bh"].shape
    wh_t_shape = t_pack["wh"].shape
    bh_t_shape = t_pack["bh"].shape

    out_shapes = [
        jax.ShapeDtypeStruct((n, OUT_PAD), jnp.float32),  # dlat
        jax.ShapeDtypeStruct((WIDTH, WIDTH), jnp.float32),  # dw1s
        jax.ShapeDtypeStruct((1, WIDTH), jnp.float32),  # db1s
        jax.ShapeDtypeStruct(wh_s_shape, jnp.float32),
        jax.ShapeDtypeStruct(bh_s_shape, jnp.float32),
        jax.ShapeDtypeStruct((WIDTH, OUT_PAD), jnp.float32),  # dwos
        jax.ShapeDtypeStruct((1, OUT_PAD), jnp.float32),  # dbos
        jax.ShapeDtypeStruct((WIDTH, WIDTH), jnp.float32),  # dw1t
        jax.ShapeDtypeStruct((OUT_PAD, WIDTH), jnp.float32),  # dw1lt
        jax.ShapeDtypeStruct((1, WIDTH), jnp.float32),  # db1t
        jax.ShapeDtypeStruct(wh_t_shape, jnp.float32),
        jax.ShapeDtypeStruct(bh_t_shape, jnp.float32),
        jax.ShapeDtypeStruct((WIDTH, OUT_PAD), jnp.float32),  # dwot
        jax.ShapeDtypeStruct((1, OUT_PAD), jnp.float32),  # dbot
    ]
    out_specs = [
        _tiled(tile, OUT_PAD),
        _rep((WIDTH, WIDTH)),
        _rep((1, WIDTH)),
        _rep(wh_s_shape),
        _rep(bh_s_shape),
        _rep((WIDTH, OUT_PAD)),
        _rep((1, OUT_PAD)),
        _rep((WIDTH, WIDTH)),
        _rep((OUT_PAD, WIDTH)),
        _rep((1, WIDTH)),
        _rep(wh_t_shape),
        _rep(bh_t_shape),
        _rep((WIDTH, OUT_PAD)),
        _rep((1, OUT_PAD)),
    ]
    kernel = functools.partial(_bwd_kernel, n_hidden_s, n_hidden_t,
                               _dtype_from_name(dtype_name), share_enc)
    (dlat, dw1s, db1s, dwhs, dbhs, dwos, dbos,
     dw1t, dw1lt, db1t, dwht, dbht, dwot, dbot) = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_tiled(tile, 3), _tiled(tile, OUT_PAD),
                  *s_specs, *t_specs,
                  _tiled(tile), _tiled(tile)],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(x, lat, *s_vals, *t_vals, g_s, g_t)

    zero = jnp.zeros_like
    ds_pack = {"F": zero(s_pack["F"]), "phase": zero(s_pack["phase"]),
               "wm": zero(s_pack["wm"]), "w1": dw1s, "b1": db1s,
               "wh": dwhs, "bh": dbhs, "wo": dwos, "bo": dbos}
    dt_pack = {"F": zero(t_pack["F"]), "phase": zero(t_pack["phase"]),
               "wm": zero(t_pack["wm"]), "w1": dw1t, "w1l": dw1lt,
               "b1": db1t, "wh": dwht, "bh": dbht, "wo": dwot, "bo": dbot}
    return jnp.zeros_like(x), dlat, ds_pack, dt_pack


_fused_core.defvjp(_fused_core_fwd, _fused_core_bwd)


# ---------------------------------------------------------------------------
# Public API


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
    """Drop-in fused replacement for the static+temporal field evaluation.

    ``points [R, S, 3]``, ``point_phases [R, S]`` -> two ``[R, S, 1]`` raw
    density tensors, matching ``apply_static_field``/``apply_temporal_field``
    to float32 precision. Differentiable w.r.t. both param pytrees
    (including the latent table); points are treated as constants (the ray
    geometry is data, never learned) so no dead cotangent chain is built.
    """
    if not (pallas_supported(cfg_s) and pallas_supported(cfg_t)):
        raise ValueError("config not supported by the fused kernel")
    r, s, _ = points.shape
    n = r * s
    pad = (-n) % tile
    x = jax.lax.stop_gradient(points.reshape(n, 3))
    phases_flat = point_phases.reshape(n).astype(jnp.int32)
    # latent lookup as a one-hot matmul: the reverse pass becomes a thin
    # [P, n] x [n, D] MXU matmul instead of a 512k-row scatter-add, which
    # XLA lowers very poorly on TPU
    onehot = jax.nn.one_hot(
        phases_flat, params_t["latents"].shape[0], dtype=jnp.float32
    )
    lat = onehot @ params_t["latents"]  # [n, D], differentiable
    d = lat.shape[-1]
    # profiling showed the unconditional pad costs ~2 ms/step in HBM copies;
    # the flagship num_time_dim == OUT_PAD so it is usually an identity
    lat_p = (
        lat
        if d == OUT_PAD
        else jnp.zeros((n, OUT_PAD), lat.dtype).at[:, :d].set(lat)
    )
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)])
        lat_p = jnp.concatenate([lat_p, jnp.zeros((pad, OUT_PAD), lat_p.dtype)])

    s_pack = _pack_static(params_s, cfg_s, window_s)
    t_pack = _pack_temporal(params_t, cfg_t, window_t)

    share_enc = (
        cfg_s.pos_enc_basis == cfg_t.pos_enc_basis
        and (cfg_s.pos_enc == "none") == (cfg_t.pos_enc == "none")
    )
    out_s, out_t = _fused_core(
        x, lat_p, s_pack, t_pack,
        cfg_s.num_early_layers, cfg_t.num_early_layers, tile, compute_dtype,
        share_enc,
    )
    raw_s = out_s[:n].reshape(r, s, 1)
    raw_t = out_t[:n].reshape(r, s, 1)
    return raw_s, raw_t


def fused_static_field(params, points, cfg: FieldConfig, window,
                       tile: int = DEFAULT_TILE, compute_dtype: str = "float32"):
    """Single-field fused evaluation (run_nerf path): ``[R, S, 3] ->
    [R, S, 1]``. Reuses the composite kernel with a zero dummy temporal
    field to keep one code path."""
    if not pallas_supported(cfg):
        raise ValueError("config not supported by the fused kernel")
    import dataclasses

    dummy = {
        "early": [{"w": jnp.zeros((cfg.encoded_features + OUT_PAD, WIDTH)),
                   "b": jnp.zeros(WIDTH)}]
        + [{"w": jnp.zeros((WIDTH, WIDTH)), "b": jnp.zeros(WIDTH)}
           for _ in range(cfg.num_early_layers)],
        "out": {"w": jnp.zeros((WIDTH, 1)), "b": jnp.zeros(1)},
        "latents": jnp.zeros((10, OUT_PAD)),
    }
    dummy_cfg = dataclasses.replace(cfg, use_time_latents=True, num_time_dim=OUT_PAD)
    phases = jnp.zeros(points.shape[:2], jnp.int32)
    raw_s, _ = fused_composite_fields(
        params, dummy, points, phases, cfg, dummy_cfg, window, window,
        tile, compute_dtype,
    )
    return raw_s
