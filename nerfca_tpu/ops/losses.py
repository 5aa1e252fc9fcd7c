"""Separation regularizers and the pixel loss for static/dynamic decomposition.

Reference parity: ``train/model_helpers.py:189-289``. All losses are pure
fixed-shape jnp functions of ``(sigma, dists, ...)`` so the full regularizer
battery fuses into the train step. Quirks preserved (and documented):

  - ``occlusion_loss`` with ``use_back=False`` (the shipped default): the
    reference initializes the back mask to ONES before OR-ing
    (``model_helpers.py:237-242``), so the mask covers the ENTIRE ray and
    the loss degenerates to a full-ray L1 of ``sigma * dists``. With
    ``use_back=True`` the mask is front-fraction OR back-fraction. Behavior
    is reproduced exactly.
  - ``static l1/l2`` reduce with ``.sum()`` over rays, not ``.mean()``
    (``model_helpers.py:256-257``) — their magnitude scales with batch size.
  - the static-field ray entropy is computed and logged but never added to
    the training loss (``run_composite.py:290-292``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def blend_ratio(sigma_s, sigma_d):
    """Dynamic blend weight ``sigma_d / (sigma_s + sigma_d + 1e-10)`` plus
    stop-gradient maxima diagnostics (``model_helpers.py:189-198``)."""
    blendw = sigma_d / (sigma_s + sigma_d + 1e-10)
    sigma_s_max = jax.lax.stop_gradient(jnp.max(sigma_s))
    sigma_d_max = jax.lax.stop_gradient(jnp.max(sigma_d))
    return blendw, sigma_s_max, sigma_d_max


def blendw_entropy_loss(blendw, skewness: float = 1.0, clip_threshold: float = 1e-19):
    """Favor-static loss: mean binary entropy of ``blendw ** skewness``
    (D2NeRF-style, ``model_helpers.py:200-204``)."""
    b = jnp.clip(blendw**skewness, clip_threshold, 1 - clip_threshold)
    rev = jnp.clip(1 - b, clip_threshold, None)
    entropy = jnp.mean(-(b * jnp.log(b) + rev * jnp.log(rev)), axis=-1)
    return jnp.mean(entropy)


def ray_entropy_loss(
    sigma,
    dists,
    mask_threshold: float = 0.1,
    clip_threshold: float = 1e-19,
    use_weighting: bool = False,
    weighted_pixs=None,
    weighted_thresh: float = 0.25,
):
    """Per-ray density-distribution entropy, masked to substantial rays.

    ``p_i = sigma_i dist_i / sum(sigma dist)``; entropy only counts for rays
    whose attenuation sum exceeds ``mask_threshold``, OR-ed (when
    ``use_weighting``) with the motion-variance mask ``weighted_pixs >
    1 + weighted_thresh`` so high-motion rays keep their entropy term even
    when nearly empty (``model_helpers.py:206-224``).

    Returns ``(mean entropy, mean attenuation sum)``.
    """
    sigma_dist = sigma * dists
    sigma_sum = jnp.sum(sigma_dist, axis=-1, keepdims=True)  # [R, 1]

    mask = (sigma_sum[..., 0] >= mask_threshold)
    if use_weighting and weighted_pixs is not None:
        mask = jnp.logical_or(mask, weighted_pixs > 1.0 + weighted_thresh)

    # Backward-NaN guard (double-where): on rays whose density is EXACTLY
    # zero everywhere (the motion hull gates dynamic sigma to 0.0 — the
    # reference never lands here, its softplus sigma is strictly positive)
    # the divide VJP computes -x/y^2 with y = clip_threshold; the reference
    # default 1e-19 squares below f32's minimum normal, so the term becomes
    # 0/0 = NaN and one hull-gated step NaNs the temporal params. Route the
    # denominator cotangent of near-empty rays through stop_gradient:
    # forward values are bit-identical, the numerator gradient g/clip is
    # kept exactly as the reference computes it, and the dropped term is
    # the reference's own 1/sum garbage (|grad| >= 1e15 when it fires).
    clipped = jnp.clip(sigma_sum, clip_threshold, None)
    risky = sigma_sum < jnp.asarray(1e-15, sigma_sum.dtype)
    denom = jnp.where(risky, jax.lax.stop_gradient(clipped), clipped)
    ray_p = sigma_dist / denom
    entropy = mask * -jnp.sum(ray_p * jnp.log(ray_p + 1e-10), axis=-1)
    return jnp.mean(entropy), jnp.mean(sigma_sum)


def occlusion_loss(sigma, dists, reg_perc: float = 0.1, use_back: bool = False,
                   front_only: bool = False):
    """Suppress density along masked ray portions (``model_helpers.py:226-248``).

    ``dists`` is the shared 1-D ``[S]`` delta vector. See module docstring
    for the ``use_back=False`` full-ray quirk, preserved here as the
    default: the reference initializes ``mask_back`` to ones and only
    overwrites it when ``use_back`` is set (``model_helpers.py:240-243``),
    so its front-OR-back union degenerates to the FULL ray — an L1 on all
    dynamic density, contradicting the function's own near-camera comment.
    That term is what crushes the dynamic field's mid-ray vessel mass (the
    round-3 trajectory A/B shows the reference trainer failing to separate
    for the same reason). ``front_only=True`` implements the documented
    intent instead: penalize only the near-camera ``reg_perc`` of each ray
    (floater suppression) and leave mid-ray dynamic mass untaxed.
    """
    cum_dists = jnp.cumsum(dists)
    total = cum_dists[-1]
    if front_only:
        mask = cum_dists < reg_perc * total
    elif use_back:
        mask_front = cum_dists < reg_perc * total
        mask_back = cum_dists > (1 - reg_perc) * total
        mask = jnp.logical_or(mask_front, mask_back)
    else:
        mask = jnp.ones_like(cum_dists, dtype=bool)
    loss = jnp.sum(sigma * dists * mask, axis=-1)
    return jnp.mean(loss)


def weighted_mse(preds, gts, weights):
    """Per-pixel weighted squared error (``model_helpers.py:284-289``);
    reduction is the caller's responsibility, as in the reference."""
    return (preds - gts) ** 2 * weights


def along_ray_tv(sigma):
    """Along-ray total variation: mean over rays of sum_i |σ_{i+1} − σ_i|.

    Framework extension (no reference counterpart): the classic
    sparse-view-CT prior (TV-minimization, Sidky & Pan 2008) adapted to
    a ray-sampled neural field. The round-5 collapse forensics at 1.0×
    local vessel contrast (`artifacts/round5/repair_forensics-0p18.json`)
    diagnose every conventional repair arm's failure as 4-view
    memorization — the static field grows high-frequency along-ray
    speckle that explains the 4 training views and destroys the other
    36. Adjacent depth samples are spatially adjacent points, so the
    first difference along the sample axis is a (stratified) directional
    derivative; penalizing its L1 norm is the standard piecewise-smooth
    anatomy prior. Computed from the already-evaluated per-ray sigma —
    no extra field evaluations. Depth spacing is uniform per-batch
    (``linspace_depths`` + shared jitter), so the |Δσ| form differs from
    |Δσ/Δs| only by a constant the weight schedule absorbs.
    """
    return jnp.mean(jnp.sum(jnp.abs(sigma[..., 1:] - sigma[..., :-1]), axis=-1))


class CompositeLosses(NamedTuple):
    """Everything ``compute_losses`` returns (``model_helpers.py:250-262``)."""

    blendw_mean: jnp.ndarray
    sigma_s_max: jnp.ndarray
    sigma_d_max: jnp.ndarray
    favor_s_loss: jnp.ndarray
    static_entropy_loss: jnp.ndarray
    static_entropy_sum: jnp.ndarray
    dynamic_entropy_loss: jnp.ndarray
    dynamic_entropy_sum: jnp.ndarray
    dynamic_occl_loss: jnp.ndarray
    static_l1_loss: jnp.ndarray
    static_l2_loss: jnp.ndarray


def composite_losses(
    static_sigma,
    temp_sigma,
    dists,
    weighted_pixs,
    *,
    skewness_val: float = 1.0,
    entro_mask_thre: float = 0.1,
    entro_use_weighting: bool = False,
    entro_weighted_thresh: float = 0.0,
    occl_reg_perc: float = 0.1,
    entro_clip_threshold: float = 1e-19,
    occl_front_only: bool = False,
) -> CompositeLosses:
    """Bundle the composite regularizer battery (``model_helpers.py:250-262``).

    ``entro_clip_threshold``: floor of the per-ray normalization sum in the
    entropy terms. The reference's 1e-19 default makes the entropy gradient
    ~1/clip(sum) on near-empty rays the variance mask keeps active —
    harmless at the shipped ~1e-8 weights, but it explodes to NaN within a
    few thousand steps at weights large enough to actually drive the
    static/dynamic separation. Raise it (e.g. 1e-6) when sweeping real
    entropy weights."""
    blendw, sigma_s_max, sigma_d_max = blend_ratio(static_sigma, temp_sigma)
    favor_s = blendw_entropy_loss(blendw, skewness=skewness_val)
    s_entropy, s_entropy_sum = ray_entropy_loss(
        static_sigma, dists, mask_threshold=entro_mask_thre,
        clip_threshold=entro_clip_threshold,
    )
    d_entropy, d_entropy_sum = ray_entropy_loss(
        temp_sigma,
        dists,
        mask_threshold=entro_mask_thre,
        clip_threshold=entro_clip_threshold,
        use_weighting=entro_use_weighting,
        weighted_pixs=weighted_pixs,
        weighted_thresh=entro_weighted_thresh,
    )
    d_occl = occlusion_loss(
        temp_sigma, dists, occl_reg_perc, front_only=occl_front_only
    )
    static_l1 = jnp.sum(jnp.sum(static_sigma * dists, axis=-1))
    static_l2 = jnp.sum(jnp.sum((static_sigma * dists) ** 2, axis=-1))
    return CompositeLosses(
        blendw_mean=jnp.mean(blendw),
        sigma_s_max=sigma_s_max,
        sigma_d_max=sigma_d_max,
        favor_s_loss=favor_s,
        static_entropy_loss=s_entropy,
        static_entropy_sum=s_entropy_sum,
        dynamic_entropy_loss=d_entropy,
        dynamic_entropy_sum=d_entropy_sum,
        dynamic_occl_loss=d_occl,
        static_l1_loss=static_l1,
        static_l2_loss=static_l2,
    )
