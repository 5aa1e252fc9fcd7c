"""Monolithic train-gradient kernel: forward MLPs + Beer-Lambert render +
the full regularizer battery + backprop in ONE Pallas pass.

Why: the two-kernel step (forward kernel -> XLA losses -> backward kernel
that RECOMPUTES the forward) pays the forward compute twice plus the [n]
raw-density HBM round trips. Folding the loss into the backward pass makes
the forward kernel dispatch disappear entirely: per tile this kernel runs
encode -> MLPs -> per-ray loss partials -> in-kernel VJP -> weight-gradient
accumulation, all in VMEM.

Design points:
  - Tiles are RAY-ALIGNED: ``tile = rays_per_tile x S_pad`` with each
    ray's samples padded from S (500) to S_pad (512). Padded samples get
    dist 0, so every per-ray reduction ignores them; per-sample means
    (blendw entropy) are masked and divided by the true count.
  - The per-tile loss is written as PLAIN JNP inside the kernel and
    differentiated with ``jax.vjp`` IN-KERNEL — Mosaic compiles the traced
    cotangent ops, so there is no hand-derived gradient to drift from
    ``ops/losses``. Every global mean decomposes as a per-tile partial sum
    over static divisors, so d(total)/d(raw_tile) = d(tile_partial)/d(raw_tile).
  - Loss/metric terms come out as a [TERMS, 1] accumulator; packed weight
    gradients accumulate across the sequential grid exactly like the
    two-kernel backward. The packed weights are pulled back with
    ``jax.vjp`` so parameter gradients need no hand mapping.
  - Per-ray data (gt pixel, variance weight, I0, phase) rides in rows 3-6
    of the [8, N] geometry stream (they were zero padding), and the time
    latents are gathered IN-KERNEL from the [LAT_ROWS, P] table via a
    phase-indicator matmul whose adjoint accumulates the table gradient
    [LAT_ROWS, P] — no [N]-sized latent/gt/weight streams cross HBM.
  - The annealed loss WEIGHTS arrive as a traced [8, 1] vector, so weight
    sweeps still share this kernel's single compile.

Scope: the coarse composite path (``depth_samples_fine == 0``) with the
kernel-supported field configs; callers fall back to the two-kernel path
otherwise. Reference math being fused: ``train/model_helpers.py:72-97``
(renderer), ``:189-262`` (regularizers), on top of the field math of
``fused_field.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerfca_tpu.models.fields import FieldConfig
from nerfca_tpu.ops.pallas import fused_field as ff

GEOM_ROWS = ff.GEOM_ROWS
LAT_ROWS = ff.LAT_ROWS
WIDTH = ff.WIDTH
TERMS = 16  # padded term-accumulator rows

# term indices in the accumulator
(T_PIX, T_FAVOR, T_S_ENT, T_S_SIG, T_D_ENT, T_D_SIG, T_OCCL, T_L1, T_L2,
 T_BLENDW, T_SMAX, T_DMAX, T_HL1) = range(13)


def fused_train_supported(cfg_s: FieldConfig, cfg_t: FieldConfig,
                          hp) -> bool:
    """Envelope of the monolithic train-gradient kernel.

    ``depth_samples_fine == 0`` is a PERMANENT scope decision, not a gap:
    the reference ships the fine hierarchy disabled
    (``/root/reference/train/composite.txt:26`` N_importance = 0), the
    fine pass needs per-ray sorted depths (a data-dependent gather the
    Mosaic kernel's fixed [rows, T] tiling can't express without a
    scatter, which Mosaic forbids — see BENCH.md kernel rules), and the
    XLA path covers fine-enabled configs at full fidelity. A fine-enabled
    run composes the coarse Pallas field kernel with the XLA fine pass via
    ``make_composite_train_step``'s per-pass gating; a test pins the
    fallback (``tests/test_fused_train.py::test_fine_pass_falls_back_to_xla``).
    """
    return (
        hp.use_pallas
        and getattr(hp, "use_fused_loss", False)
        and hp.depth_samples_fine == 0
        # along-ray static TV (a round-5 anti-memorization arm) lives on
        # the XLA path only; same fallback contract as the fine pass
        and getattr(hp, "static_tv_weight_start", 0.0) == 0.0
        and getattr(hp, "static_tv_weight_end", 0.0) == 0.0
        and ff.pallas_supported(cfg_s)
        and ff.pallas_supported(cfg_t)
        and hp.output_activation in ("softplus", "sigmoid", "clamp")
    )


def _act_sigma(raw, activation: str):
    """raw -> sigma, matching get_activation_func + the composite
    renderer's 1e-2 scale (``model_helpers.py:63-84``)."""
    if activation == "softplus":
        a = jax.nn.softplus(raw)
    elif activation == "sigmoid":
        a = jax.nn.sigmoid(raw)
    else:  # clamp = hardtanh(softplus, 0, 1)
        a = jnp.clip(jax.nn.softplus(raw), 0.0, 1.0)
    return a * 1e-2


def _seg_sum_impl(vec_kt, seg):
    """[k, T] -> [k, T]: each sample holds its ray's segment sum (per row).

    Per-ray sums are ONE thin matmul contracting over T.
    Precision.HIGHEST is load-bearing there: the default TPU matmul
    precision feeds the MXU bf16 operands, which truncates the
    Beer-Lambert render sums enough to shift the pixel loss by ~1e-3
    relative — caught by bench.py's hardware gate (CPU interpret mode
    computes true f32 and cannot see it).

    The broadcast BACK to samples is NOT a matmul: seg's rows partition
    the tile, so every output element has exactly one contributing term —
    an unrolled select-FMA over the rt rays is exact in f32 and keeps a
    K=rt HIGHEST matmul (multiple full-length MXU column streams) off the
    critical path."""
    s = jax.lax.dot_general(vec_kt, seg, (((1,), (1,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)  # [k, rt]
    rt = seg.shape[0]
    out = s[:, 0:1] * seg[0:1, :]
    for r_i in range(1, rt):
        out = out + s[:, r_i : r_i + 1] * seg[r_i : r_i + 1, :]
    return out


@jax.custom_vjp
def _seg_sum(vec_kt, seg):
    return _seg_sum_impl(vec_kt, seg)


def _seg_sum_fwd(vec_kt, seg):
    return _seg_sum_impl(vec_kt, seg), seg


def _seg_sum_bwd(seg, g):
    # seg_sum's matrix (seg^T seg) is symmetric -> the op is self-adjoint,
    # so the transpose reuses the same efficient (matmul + select-FMA)
    # form instead of AD's two extra HIGHEST matmuls.
    return _seg_sum_impl(g, seg), jnp.zeros_like(seg)


_seg_sum.defvjp(_seg_sum_fwd, _seg_sum_bwd)


def _tile_loss(raw_s, raw_t, gt, wts, i0, dists, occl_mask, valid, first,
               seg, lw, hp_tuple, n_rays_total, s_valid, hull_row):
    """Per-tile partial of the TOTAL training loss, plus metric partials.

    Everything lives in PER-SAMPLE row-vector layout [1, T] (Mosaic has no
    shape-cast for (T,) -> (rt, s_pad), so there are NO reshapes here):

      - ``seg`` [rt, T]: segment-indicator matrix; per-ray sums are one
        thin matmul and broadcasting them back per sample is another.
      - ``first`` [1, T]: 1 at each ray's first sample — terms that count
        once per ray sum ``first * value`` over samples.
      - ``gt``/``wts``/``i0`` are per-ray values expanded per sample.

    Math mirrors ``ops/render.py`` and ``ops/losses.py`` exactly,
    restructured as partial sums over STATIC divisors so the in-kernel VJP
    yields the global cotangents.
    """
    (activation, skewness, mask_thre, use_weighting, weighted_thresh,
     clip_thr) = hp_tuple[:6]
    R = n_rays_total

    def seg_sum(vec_kt):
        return _seg_sum(vec_kt, seg)

    # STACKED-ROW layout: the static/dynamic streams ride as rows 0/1 of
    # [2, T] arrays, and all four entropy logarithms collapse into ONE
    # [4, T] transcendental. A [1, T] row vector occupies only 1 of the 8
    # f32 sublanes per vreg, so every elementwise op on it wastes 7/8 of
    # the VPU; stacking the parallel streams recovers 2-4x on the loss
    # pipeline's VPU work (the math is unchanged — rows never mix except
    # where the reference sums them).
    raw = jnp.concatenate([raw_s, raw_t], axis=0)  # [2, T]
    # the motion-hull gate (ops/hull.py) rides in geometry row 7; it is
    # all-ones when the hull is off, and x * 1.0 is bitwise-exact in f32,
    # so the ungated path is unchanged. The gate applies to the DYNAMIC
    # row only.
    gate = jnp.concatenate([jnp.ones_like(hull_row), hull_row], axis=0)
    sig = _act_sigma(raw, activation) * gate  # [2, T]
    sd = sig * dists  # [2, T]
    ssum = seg_sum(sd)  # [2, T] per-row per-ray sums

    # pixel term: sum_r w_r (pix_r - gt_r)^2 / R, counted once per ray
    pix = i0 - (ssum[0:1, :] + ssum[1:2, :])
    pix_partial = jnp.sum(first * wts * (pix - gt) ** 2) / R

    # favor_s: mean over [R, S_valid] of the blendw binary entropy
    blendw = sig[1:2, :] / (sig[0:1, :] + sig[1:2, :] + 1e-10)
    b = jnp.clip(blendw**skewness, 1e-19, 1 - 1e-19)
    rev = jnp.clip(1 - b, 1e-19, None)
    brev = jnp.concatenate([b, rev], axis=0)  # [2, T]

    # per-ray density-distribution entropies (both fields at once).
    # Double-where backward-NaN guard, mirroring ops/losses.py::
    # ray_entropy_loss: hull-gated rays can be EXACTLY zero-density, and
    # the divide VJP's -x/y^2 term with y = clip_thr (reference default
    # 1e-19) underflows f32 to 0/0 = NaN. stop_gradient the denominator
    # cotangent on near-empty rays; forward is bit-identical.
    ssum_clipped = jnp.clip(ssum, clip_thr, None)
    ssum_risky = ssum < 1e-15
    p = sd / jnp.where(
        ssum_risky, jax.lax.stop_gradient(ssum_clipped), ssum_clipped
    )  # [2, T]

    logs = jnp.log(jnp.concatenate([brev, p + 1e-10], axis=0))  # [4, T]

    ent_b = -(brev[0:1, :] * logs[0:1, :]
              + brev[1:2, :] * logs[1:2, :]) * valid
    favor_partial = jnp.sum(ent_b) / (R * s_valid)

    mask = (ssum >= mask_thre).astype(jnp.float32)  # [2, T]
    if use_weighting:
        # the variance-mask OR-in applies to the DYNAMIC entropy only
        var_mask = (wts > 1.0 + weighted_thresh).astype(jnp.float32)
        row2 = jax.lax.broadcasted_iota(jnp.int32, (2, 1), 0)
        mask = jnp.where(row2 == 1, jnp.maximum(mask, var_mask), mask)
    ent_rows = mask * -(p * logs[2:4, :]) * valid  # [2, T]
    s_ent_partial = jnp.sum(ent_rows[0:1, :]) / R
    d_ent_partial = jnp.sum(ent_rows[1:2, :]) / R
    s_sig_partial = jnp.sum(first * ssum[0:1, :]) / R
    d_sig_partial = jnp.sum(first * ssum[1:2, :]) / R

    sd_s = sd[0:1, :]
    occl_partial = jnp.sum(sd[1:2, :] * occl_mask) / R
    l1_partial = jnp.sum(sd_s)
    l2_partial = jnp.sum(sd_s**2)
    # hull-gated static L1 (framework extension, weight defaults to 0):
    # penalize STATIC mass inside the motion hull — the territory carved
    # for the dynamic vessel — pushing vessel attenuation into the dynamic
    # field at low vessel contrast, where the pixel loss alone lets the
    # static field absorb it. Mean-per-ray normalized (unlike the
    # reference's sum-reduced L1: this term has no reference analog to
    # stay parity with).
    # has_hull is STATIC (hull-ness already changes the jit signature):
    # without a hull the geometry row is all-ones and this would silently
    # become a plain static L1 — the XLA path defines it as 0 instead.
    has_hull = hp_tuple[6]
    hl1_partial = (
        jnp.sum(sd_s * hull_row) / R if has_hull else jnp.float32(0.0)
    )

    loss_partial = (
        pix_partial
        + lw[0] * favor_partial
        + lw[1] * d_ent_partial
        + lw[2] * occl_partial
        + lw[3] * l2_partial
        + lw[3] * l1_partial
        + lw[4] * hl1_partial
    )
    aux = {
        "pix": pix_partial,
        "favor": favor_partial,
        "s_ent": s_ent_partial,
        "s_sig": s_sig_partial,
        "d_ent": d_ent_partial,
        "d_sig": d_sig_partial,
        "occl": occl_partial,
        "l1": l1_partial,
        "l2": l2_partial,
        "hl1": hl1_partial,
        "blendw": jnp.sum(blendw * valid) / (R * s_valid),
        # padded samples repeat the ray's last depth point, so the maxima
        # are unaffected by padding
        "smax": jnp.max(sig[0:1, :]),
        "dmax": jnp.max(sig[1:2, :]),
    }
    return loss_partial, aux


def _train_kernel(n_hidden_s, n_hidden_t, dtype, store_dtype, share_enc,
                  spec_s, spec_t,
                  rt, s_pad, n_rays_total, s_valid, hp_tuple,
                  geom_ref, lat_tab_ref,
                  dists_ref, occl_ref, valid_ref, first_ref, seg_ref, lw_ref,
                  fs, phs, wms, w1s, b1s, whs, bhs, wos, bos, woTs,
                  ft, pht, wmt, w1t, w1lt, b1t, wht, bht, wot, bot, woTt,
                  terms_ref, dlat_tab_ref,
                  dw1s_ref, db1s_ref, dwhs_ref, dbhs_ref, dwos_ref, dbos_ref,
                  dw1t_ref, dw1lt_ref, db1t_ref, dwht_ref, dbht_ref,
                  dwot_ref, dbot_ref):
    geom = geom_ref[:]
    # geometry rows double as the per-ray data channels (rows 3-6 were
    # zero padding): gt / variance weights / I0 expanded per sample, and
    # the ray's integer phase as f32 — one [8, N] HBM stream instead of
    # four separate [N] arrays plus an [8, N] latent stream.
    gt = geom[3:4, :]
    wts = geom[4:5, :]
    i0 = geom[5:6, :]
    phase_row = geom[6:7, :]
    hull_row = geom[7:8, :]  # motion-hull gate (ones when the hull is off)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for ref in (terms_ref, dlat_tab_ref,
                    dw1s_ref, db1s_ref, dwhs_ref, dbhs_ref, dwos_ref,
                    dbos_ref, dw1t_ref, dw1lt_ref, db1t_ref, dwht_ref,
                    dbht_ref, dwot_ref, dbot_ref):
            ref[:] = jnp.zeros_like(ref)

    enc_s, enc_t = ff._both_encodings(
        geom, fs[:], phs[:], wms[:], ft[:], pht[:], wmt[:], share_enc,
        spec_s, spec_t,
    )

    # per-sample latents from the [LAT_ROWS, P] table, IN-KERNEL: a
    # [P, T] phase-indicator (iota == phase row) and one thin matmul.
    # Replaces a [LAT_ROWS, N] HBM input + [LAT_ROWS, N] cotangent output
    # (~32 MB/step round trip) with a [LAT_ROWS, P] accumulator.
    # Precision.HIGHEST: the indicator is exact, but default TPU matmul
    # precision would truncate the latent VALUES to bf16.
    n_phases = lat_tab_ref.shape[1]
    tile_t = geom.shape[1]
    # NB: Mosaic only lowers INTEGER iota; build i32 and sitofp (an f32
    # iota trips 'tpu.iota must be vector of integer values' on hardware
    # even though interpret mode accepts it)
    phase_iota = jax.lax.broadcasted_iota(
        jnp.int32, (n_phases, tile_t), 0
    ).astype(jnp.float32)
    onehot = (phase_iota == phase_row).astype(jnp.float32)  # [P, T]
    # the GATHER is an unrolled select-FMA over the P phases: each sample
    # matches exactly one phase, so the sum has a single nonzero term —
    # exact in f32 and pure VPU, where the indicator MATMUL (K=P at
    # HIGHEST) costs multiple full-length MXU column streams. The adjoint
    # below keeps the matmul form: it contracts over T (K=T — efficient)
    # and genuinely sums thousands of terms.
    lat_tab = lat_tab_ref[:]
    lat = lat_tab[:, 0:1] * onehot[0:1, :]
    for p_i in range(1, n_phases):
        lat = lat + lat_tab[:, p_i : p_i + 1] * onehot[p_i : p_i + 1, :]
    # [LAT_ROWS, T]

    o_s, _, hs_s = ff._mlp_forward(
        enc_s, w1s[:], b1s[:], whs[:], bhs[:], wos[:], bos[:], dtype=dtype,
        store_dtype=store_dtype,
    )
    o_t, _, hs_t = ff._mlp_forward(
        enc_t, w1t[:], b1t[:], wht[:], bht[:], wot[:], bot[:],
        lat=lat, w1l=w1lt[:], dtype=dtype, store_dtype=store_dtype,
    )
    raw_s = o_s[0:1, :]  # [1, T] row-vector layout throughout the loss
    raw_t = o_t[0:1, :]

    def loss_fn(a, b):
        return _tile_loss(
            a, b, gt, wts,
            i0, dists_ref[:][None, :],
            occl_ref[:][None, :], valid_ref[:][None, :],
            first_ref[:][None, :], seg_ref[:], lw_ref[:][:, 0], hp_tuple,
            n_rays_total, s_valid, hull_row,
        )

    loss_partial, vjp, aux = jax.vjp(loss_fn, raw_s, raw_t, has_aux=True)
    g_raw_s_1t, g_raw_t_1t = vjp(jnp.float32(1.0))
    g_raw_s = g_raw_s_1t[0]
    g_raw_t = g_raw_t_1t[0]

    # accumulate loss/metric partials (sums accumulate; maxes via maximum).
    # Built scatter-free: Mosaic has no scatter lowering, so the update is
    # a stacked vector plus iota-selected rows for the running maxima.
    t = terms_ref[:]
    zero = jnp.float32(0.0)
    upd = jnp.stack(
        [aux["pix"], aux["favor"], aux["s_ent"], aux["s_sig"],
         aux["d_ent"], aux["d_sig"], aux["occl"], aux["l1"], aux["l2"],
         aux["blendw"], zero, zero, aux["hl1"], zero, zero, zero]
    )[:, None]
    terms = t + upd
    row = jax.lax.broadcasted_iota(jnp.int32, (TERMS, 1), 0)
    terms = jnp.where(row == T_SMAX, jnp.maximum(t, aux["smax"]), terms)
    terms = jnp.where(row == T_DMAX, jnp.maximum(t, aux["dmax"]), terms)
    terms_ref[:] = terms

    # MLP backprop with the in-kernel cotangents (row 0 carries the
    # signal). Residuals are the post-ReLU activations ONLY (one [128, T]
    # per layer held live across the loss VJP — residual VMEM gates the
    # tile size); the ReLU masks derive from them exactly (h > 0 iff
    # pre > 0), so the pre-activations die at the end of the forward and
    # nothing is recomputed in the backward.
    row = jax.lax.broadcasted_iota(jnp.int32, (GEOM_ROWS, 1), 0)
    g_s_full = jnp.where(row == 0, g_raw_s[None, :], 0.0)
    g_t_full = jnp.where(row == 0, g_raw_t[None, :], 0.0)

    g_s = ff._field_bwd(g_s_full, enc_s, None, hs_s, whs[:], wos[:],
                        dtype=dtype, woT=woTs[:])
    dw1s_ref[:] += g_s["w1"]
    db1s_ref[:] += g_s["b1"]
    if n_hidden_s:
        dwhs_ref[:] += g_s["wh"]
        dbhs_ref[:] += g_s["bh"]
    dwos_ref[:] += g_s["wo"]
    dbos_ref[:] += g_s["bo"]

    g_t = ff._field_bwd(g_t_full, enc_t, None, hs_t, wht[:], wot[:],
                        lat=lat, w1l=w1lt[:], dtype=dtype, woT=woTt[:])
    dw1t_ref[:] += g_t["w1"]
    dw1lt_ref[:] += g_t["w1l"]
    db1t_ref[:] += g_t["b1"]
    if n_hidden_t:
        dwht_ref[:] += g_t["wh"]
        dbht_ref[:] += g_t["bh"]
    dwot_ref[:] += g_t["wo"]
    dbot_ref[:] += g_t["bo"]
    # latent-table gradient: pull the per-sample cotangents back through
    # the phase indicator (the adjoint of the in-kernel gather matmul)
    dlat_tab_ref[:] += jax.lax.dot_general(
        g_t["dlat"], onehot, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def fused_train_loss_and_grads(
    params_s,
    params_t,
    origins,
    directions,
    z,
    ray_phases,
    pixels,
    weights,
    initial_intensities,
    cfg_s: FieldConfig,
    cfg_t: FieldConfig,
    window_s,
    window_t,
    loss_weights_vec,
    hp,
    rays_per_tile: int = 2,
    total_rays: int | None = None,
    hull=None,
):
    """One-pass training loss + parameter gradients for the coarse
    composite objective.

    ``hull``: optional ``ops.hull.MotionHull``; its gate values are
    evaluated here (plain XLA gathers over the per-sample coordinates) and
    ride in as geometry row 7 — previously zero padding, so the gated path
    adds no HBM traffic and the ungated path is bitwise-unchanged (row of
    ones; f32 multiply by 1.0 is exact).

    Returns ``(loss, term_dict, grads_s, grads_t)`` where ``term_dict``
    carries the individual (unweighted) loss terms for the metrics dict.
    ``loss_weights_vec``: traced ``[favor, dentro, occl, l1]``.

    ``total_rays``: global ray count for the mean normalizations when this
    call computes one shard of a data-parallel batch (the per-shard outputs
    are then PARTIALS of the global means/sums — psum them across shards;
    see :func:`fused_train_loss_and_grads_sharded`). Defaults to the local
    ray count (single-device semantics).
    """
    r = origins.shape[0]
    s = z.shape[0]
    assert r % rays_per_tile == 0, (r, rays_per_tile)
    s_pad = ((s + 511) // 512) * 512
    rt = rays_per_tile
    n = r * s_pad
    grid = (r // rt,)

    # per-ray-padded geometry rows: padded samples repeat the last depth.
    # Rows 3-6 carry the per-ray data channels (gt, variance weight, I0,
    # phase) expanded per sample — they were zero padding, so packing them
    # here adds NO HBM traffic while deleting four separate [N]-sized
    # streams (three inputs + the latent gather input).
    z_pad = jnp.concatenate([z, jnp.broadcast_to(z[-1:], (s_pad - s,))])
    rows = [
        (origins[:, c : c + 1] + z_pad[None, :] * directions[:, c : c + 1])
        .reshape(n)
        for c in range(3)
    ]

    def per_ray_row(v):
        return jnp.broadcast_to(
            v.astype(jnp.float32)[:, None], (r, s_pad)
        ).reshape(n)

    rows += [
        per_ray_row(pixels),
        per_ray_row(weights),
        per_ray_row(initial_intensities),
        per_ray_row(ray_phases),  # integer phases are exact in f32
    ]
    if hull is not None:
        from nerfca_tpu.ops.hull import hull_gate

        rows.append(hull_gate(hull, rows[0], rows[1], rows[2]))
    else:
        rows.append(jnp.ones((n,), rows[0].dtype))
    rows += [jnp.zeros((n,), rows[0].dtype)] * (GEOM_ROWS - len(rows))
    geom = jnp.stack(rows, axis=0)
    geom = jax.lax.stop_gradient(geom)

    # per-TILE constant vectors (identical for every tile, so they ride in
    # as grid-invariant [tile] blocks): dists with the reference's 1e-10
    # terminal delta and zeros on padding, a validity mask, the occlusion
    # mask (the use_back=False quirk covers the FULL ray, losses.py:76-91),
    # a first-sample-of-ray flag, and the [rt, tile] segment matrix.
    tile = rt * s_pad
    dists_seg = jnp.concatenate(
        [z[1:] - z[:-1], jnp.full((1,), 1e-10, z.dtype),
         jnp.zeros((s_pad - s,), z.dtype)]
    )
    dists_t = jnp.tile(dists_seg, rt)
    valid_t = jnp.tile((jnp.arange(s_pad) < s).astype(jnp.float32), rt)
    # occlusion mask: full ray (the reference's use_back=False quirk) or
    # the documented near-camera intent (hp.occl_front_only) — padded
    # samples have dist 0, so the mask value there is irrelevant
    if getattr(hp, "occl_front_only", False):
        cum = jnp.cumsum(dists_seg[:s])
        front = (cum < hp.occl_reg_perc * cum[-1]).astype(jnp.float32)
        occl_seg = jnp.concatenate(
            [front, jnp.zeros((s_pad - s,), jnp.float32)]
        )
        occl_t = jnp.tile(occl_seg, rt)
    else:
        occl_t = jnp.ones((tile,), jnp.float32)
    first_t = jnp.tile(
        (jnp.arange(s_pad) == 0).astype(jnp.float32), rt
    )
    seg = jnp.repeat(jnp.eye(rt, dtype=jnp.float32), s_pad, axis=1)

    # latent TABLE, feature-major [LAT_ROWS, P] (P = phase count): the
    # per-sample gather runs in-kernel against a phase-indicator matmul,
    # so no [LAT_ROWS, N] stream crosses HBM in either direction.
    latents = params_t["latents"]  # [P, D]
    n_phases, d_lat = latents.shape
    lat_tab = jnp.zeros((LAT_ROWS, n_phases), jnp.float32).at[:d_lat, :].set(
        latents.T
    )

    s_pack, s_pack_vjp = jax.vjp(
        lambda p: ff._pack_static(p, cfg_s, window_s), params_s
    )
    t_pack, t_pack_vjp = jax.vjp(
        lambda p: ff._pack_temporal(p, cfg_t, window_t), params_t
    )

    s_specs, s_vals = ff._pack_specs(s_pack, with_latent=False)
    t_specs, t_vals = ff._pack_specs(t_pack, with_latent=True)

    hp_tuple = (
        hp.output_activation, float(hp.skewness_val),
        float(hp.entro_mask_thre), bool(hp.entro_use_weighting),
        float(hp.entro_weighted_thresh),
        float(getattr(hp, "entro_clip_threshold", 1e-19)),
        hull is not None,
    )
    # [favor, dentro, occl, l1] or the 5-vector with the hull-gated static
    # L1 appended; unset rows stay 0 (their terms drop out exactly)
    lw = jnp.zeros((8, 1), jnp.float32)
    lw = lw.at[: loss_weights_vec.shape[0], 0].set(
        loss_weights_vec.astype(jnp.float32)
    )

    kernel = functools.partial(
        _train_kernel,
        cfg_s.num_early_layers, cfg_t.num_early_layers,
        ff._dtype_from_name(hp.compute_dtype),
        jnp.bfloat16 if getattr(hp, "pallas_bf16_residuals", False) else None,
        ff._share_enc(cfg_s, cfg_t), ff._enc_spec(cfg_s), ff._enc_spec(cfg_t),
        rt, s_pad, total_rays if total_rays is not None else r, s, hp_tuple,
    )

    wh_s_shape = s_pack["wh"].shape
    bh_s_shape = s_pack["bh"].shape
    wh_t_shape = t_pack["wh"].shape
    bh_t_shape = t_pack["bh"].shape

    out_shapes = [
        jax.ShapeDtypeStruct((TERMS, 1), jnp.float32),  # terms
        jax.ShapeDtypeStruct((LAT_ROWS, n_phases), jnp.float32),  # dlat tab
        jax.ShapeDtypeStruct((WIDTH, WIDTH), jnp.float32),
        jax.ShapeDtypeStruct((WIDTH, 1), jnp.float32),
        jax.ShapeDtypeStruct(wh_s_shape, jnp.float32),
        jax.ShapeDtypeStruct(bh_s_shape, jnp.float32),
        jax.ShapeDtypeStruct((GEOM_ROWS, WIDTH), jnp.float32),
        jax.ShapeDtypeStruct((GEOM_ROWS, 1), jnp.float32),
        jax.ShapeDtypeStruct((WIDTH, WIDTH), jnp.float32),
        jax.ShapeDtypeStruct((WIDTH, LAT_ROWS), jnp.float32),
        jax.ShapeDtypeStruct((WIDTH, 1), jnp.float32),
        jax.ShapeDtypeStruct(wh_t_shape, jnp.float32),
        jax.ShapeDtypeStruct(bh_t_shape, jnp.float32),
        jax.ShapeDtypeStruct((GEOM_ROWS, WIDTH), jnp.float32),
        jax.ShapeDtypeStruct((GEOM_ROWS, 1), jnp.float32),
    ]
    out_specs = [
        ff._rep((TERMS, 1)),
        ff._rep((LAT_ROWS, n_phases)),
        ff._rep((WIDTH, WIDTH)),
        ff._rep((WIDTH, 1)),
        ff._rep(wh_s_shape),
        ff._rep(bh_s_shape),
        ff._rep((GEOM_ROWS, WIDTH)),
        ff._rep((GEOM_ROWS, 1)),
        ff._rep((WIDTH, WIDTH)),
        ff._rep((WIDTH, LAT_ROWS)),
        ff._rep((WIDTH, 1)),
        ff._rep(wh_t_shape),
        ff._rep(bh_t_shape),
        ff._rep((GEOM_ROWS, WIDTH)),
        ff._rep((GEOM_ROWS, 1)),
    ]

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            ff._fm_tiled(GEOM_ROWS, tile),
            ff._rep((LAT_ROWS, n_phases)),  # latent table
            ff._rep((tile,)),  # dists (per-tile constant)
            ff._rep((tile,)),  # occl mask
            ff._rep((tile,)),  # valid
            ff._rep((tile,)),  # first-of-ray flags
            ff._rep((rt, tile)),  # segment matrix
            ff._rep((8, 1)),  # loss weights
            *s_specs,
            *t_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            **(
                {"vmem_limit_bytes": int(hp.pallas_vmem_mb) * 1024 * 1024}
                if getattr(hp, "pallas_vmem_mb", 0)
                else {}
            ),
        ),
        interpret=ff._INTERPRET,
    )(
        geom, jax.lax.stop_gradient(lat_tab),
        dists_t, occl_t, valid_t, first_t, seg, lw,
        *s_vals, *t_vals,
    )

    (terms, dlat_tab, dw1s, db1s, dwhs, dbhs, dwos, dbos,
     dw1t, dw1lt, db1t, dwht, dbht, dwot, dbot) = outs

    zero = jnp.zeros_like
    # woT is wo's row 0 re-laid-out as a backward-pass constant; its
    # cotangent stays zero — dL/dwo is fully carried by the "wo" entry
    ds_pack = {"F": zero(s_pack["F"]), "phase": zero(s_pack["phase"]),
               "wm": zero(s_pack["wm"]), "w1": dw1s, "b1": db1s,
               "wh": dwhs, "bh": dbhs, "wo": dwos, "bo": dbos,
               "woT": zero(s_pack["woT"])}
    dt_pack = {"F": zero(t_pack["F"]), "phase": zero(t_pack["phase"]),
               "wm": zero(t_pack["wm"]), "w1": dw1t, "w1l": dw1lt,
               "b1": db1t, "wh": dwht, "bh": dbht, "wo": dwot, "bo": dbot,
               "woT": zero(t_pack["woT"])}

    grads_s = s_pack_vjp(ds_pack)[0]
    grads_t = t_pack_vjp(dt_pack)[0]
    # the kernel accumulated the latent-table gradient directly in
    # [LAT_ROWS, P] form; transpose back to the [P, D] parameter layout
    dlatents = dlat_tab[:d_lat, :].T
    grads_t = dict(grads_t)
    grads_t["latents"] = grads_t.get("latents", 0.0) + dlatents

    term_dict = {
        "pixel_loss": terms[T_PIX, 0],
        "favor_s": terms[T_FAVOR, 0],
        "s_entropy": terms[T_S_ENT, 0],
        "s_entropy_sum": terms[T_S_SIG, 0],
        "d_entropy": terms[T_D_ENT, 0],
        "d_entropy_sum": terms[T_D_SIG, 0],
        "occl": terms[T_OCCL, 0],
        "l1": terms[T_L1, 0],
        "l2": terms[T_L2, 0],
        "blendw": terms[T_BLENDW, 0],
        "sigma_s_max": terms[T_SMAX, 0],
        "sigma_d_max": terms[T_DMAX, 0],
        "hull_s_l1": terms[T_HL1, 0],
    }
    loss = (
        term_dict["pixel_loss"]
        + loss_weights_vec[0] * term_dict["favor_s"]
        + loss_weights_vec[1] * term_dict["d_entropy"]
        + loss_weights_vec[2] * term_dict["occl"]
        + loss_weights_vec[3] * term_dict["l2"]
        + loss_weights_vec[3] * term_dict["l1"]
    )
    if loss_weights_vec.shape[0] > 4:
        loss = loss + loss_weights_vec[4] * term_dict["hull_s_l1"]
    return loss, term_dict, grads_s, grads_t


# term_dict keys that are running MAXIMA across tiles (cross-shard reduce
# with pmax); every other term is a partial of a global mean/sum (psum).
_MAX_TERMS = ("sigma_s_max", "sigma_d_max")


def fused_train_loss_and_grads_sharded(
    mesh,
    axis_name,
    params_s,
    params_t,
    origins,
    directions,
    z,
    ray_phases,
    pixels,
    weights,
    initial_intensities,
    cfg_s: FieldConfig,
    cfg_t: FieldConfig,
    window_s,
    window_t,
    loss_weights_vec,
    hp,
    rays_per_tile: int = 2,
    hull=None,
):
    """Data-parallel composition of the monolithic train-gradient kernel.

    The TPU-native replacement for the reference's single-GPU PyTorch step
    under the SURVEY §2.5 parallelism plan: each device runs the Pallas
    kernel on its shard of the ray batch (``shard_map`` over the
    ``(axis_name,)`` mesh axis), with the kernel's mean normalizations set
    to the GLOBAL ray count, so each shard emits partials of the global
    loss/terms/gradients; one ``psum`` over ICI (``pmax`` for the sigma
    maxima) completes the reduction — the natural grid extension of the
    kernel's own per-tile accumulators. Results are bitwise-equal in
    structure and numerically equal (up to f32 reduction order) to the
    single-device call on the full batch.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    r_global = origins.shape[0]
    n_shards = mesh.shape[axis_name]
    assert r_global % (n_shards * rays_per_tile) == 0, (
        r_global, n_shards, rays_per_tile
    )

    def local_fn(params_s, params_t, origins, directions, z, ray_phases,
                 pixels, weights, initial_intensities, window_s, window_t,
                 lw, *hull_args):
        loss, terms, g_s, g_t = fused_train_loss_and_grads(
            params_s, params_t, origins, directions, z, ray_phases,
            pixels, weights, initial_intensities,
            cfg_s, cfg_t, window_s, window_t, lw, hp,
            rays_per_tile=rays_per_tile, total_rays=r_global,
            hull=hull_args[0] if hull_args else None,
        )
        loss = jax.lax.psum(loss, axis_name)
        terms = {
            k: (jax.lax.pmax(v, axis_name) if k in _MAX_TERMS
                else jax.lax.psum(v, axis_name))
            for k, v in terms.items()
        }
        g_s = jax.lax.psum(g_s, axis_name)
        g_t = jax.lax.psum(g_t, axis_name)
        return loss, terms, g_s, g_t

    batch_spec = P(axis_name)
    rep = P()
    # the hull grid (when present) is replicated — every shard gates its
    # own rays against the same carved volume
    extra_args = () if hull is None else (hull,)
    extra_specs = () if hull is None else (rep,)
    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(rep, rep, batch_spec, batch_spec, rep, batch_spec,
                  batch_spec, batch_spec, batch_spec, rep, rep, rep)
        + extra_specs,
        out_specs=(rep, rep, rep, rep),
        # pallas_call's out_shape carries no varying-mesh-axes metadata, so
        # the vma checker cannot type it; the manual psum/pmax reductions
        # above establish the replicated outputs instead.
        check_vma=False,
    )(
        params_s, params_t, origins, directions, z, ray_phases,
        pixels, weights, initial_intensities, window_s, window_t,
        loss_weights_vec, *extra_args,
    )
