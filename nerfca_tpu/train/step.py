"""Jitted train steps for the composite (4-D) and static (3-D) methods.

This is the TPU redesign of the reference's host-driven loop
(``train/run_composite.py:227-312``, ``train/run_nerf.py:186-237``): ray
sampling, depth jitter, encoding annealing, field evaluation, rendering,
the full regularizer battery, and the optimizer update ALL trace into one
``jax.jit`` — zero host round-trips per iteration. Multiple steps run per
device dispatch via ``lax.scan`` (:func:`make_train_chunk`), with metrics
returned stacked for host-side logging/early-stop at chunk granularity.

Behavioral parity notes (each mirrors a reference quirk, see the ops
modules for details):
  - one shared jittered depth vector per iteration for the whole batch;
  - variance-ray oversampling draws ``nb_var`` rays (with replacement) from
    the precomputed high-variance id set and the rest from its complement
    (``run_composite.py:250-260``), on device via ``jax.random``;
  - loss = pixel + annealed (favor_s, dynamic entropy, occlusion, L1, L2);
    static entropy is computed for logging only;
  - PSNR is defined over the total REGULARIZED loss
    (``run_composite.py:303``);
  - the optional hierarchical fine pass re-evaluates separate fine models on
    the coarse+PDF depth union, and renders with ray 0's sorted depth vector
    (``model_helpers.py:131-158`` — including the ``[0, :]`` quirk).

Sharding: pass ``batch_sharding`` (a NamedSharding over the ray axis) to
constrain the sampled batch; GSPMD then shards the field evaluation over
rays and inserts the gradient all-reduce. See ``nerfca_tpu.parallel``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from nerfca_tpu.models.fields import (
    FieldConfig,
    apply_static_field,
    apply_temporal_field,
)
from nerfca_tpu.ops.encoding import free_window_alpha, free_window_mask, nerfies_alpha, nerfies_window
from nerfca_tpu.ops.losses import (
    along_ray_tv, composite_losses, occlusion_loss, weighted_mse,
)
from nerfca_tpu.ops.render import (
    render_transmission,
    render_transmission_composite,
)
from nerfca_tpu.ops.sampling import sample_pdf, stratify_depths
from nerfca_tpu.ops.schedules import linear_param_decay


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar
    rng: jax.Array


@dataclasses.dataclass(frozen=True)
class CompositeHParams:
    """Static (trace-time) hyperparameters of the composite method, distilled
    from the config surface (``train/composite.txt``)."""

    img_sample_size: int = 1024
    nb_var_rays: int = 0  # rays drawn from the high-variance set
    depth_samples_coarse: int = 500
    depth_samples_fine: int = 0
    output_activation: str = "softplus"
    # loss weight schedules (linear_param_decay)
    favor_s_weight_start: float = 0.0
    favor_s_weight_end: float = 0.0
    favor_s_weight_delay_steps: int = 0
    dynamic_entro_weight_start: float = 0.0
    dynamic_entro_weight_end: float = 0.0
    occl_weight_start: float = 0.0
    occl_weight_end: float = 0.0
    l1_weight_start: float = 0.0
    l1_weight_end: float = 0.0
    # hull-gated static L1 (framework extension, defaults off): per-ray
    # mean of the STATIC field's line integral restricted to the motion
    # hull. At low vessel contrast the pixel loss alone lets the static
    # field absorb the vessel; penalizing static mass inside the hull
    # (the territory carved FOR the dynamic field) pushes it back out.
    # No-op when no hull is in use.
    hull_static_l1_weight_start: float = 0.0
    hull_static_l1_weight_end: float = 0.0
    # along-ray TV on the static field (framework extension, defaults
    # off): the sparse-view-CT piecewise-smoothness prior, targeting the
    # 4-view memorization speckle the 0.18-contrast forensics diagnose
    # (ops/losses.py::along_ray_tv). XLA path only — a non-zero weight
    # falls back from the fused kernel like the fine pass does.
    static_tv_weight_start: float = 0.0
    static_tv_weight_end: float = 0.0
    hyperparam_decay_steps: int = 100000
    # freeze the static field's parameters from this step on (0 = never).
    # Collapse forensics (scripts/collapse_forensics.py): at 4 views the
    # static field peaks early then memorizes (held-out static render
    # 15.5 -> 5.4 dB) while the dynamic field improves monotonically
    # (15.4 -> 20.6 dB); freezing static at its peak lets the dynamic
    # field keep training without the composite collapsing. Traced via
    # schedule_from_hp — freeze sweeps share one compile.
    static_freeze_step: int = 0
    # regularizer shape parameters
    skewness_val: float = 1.0
    entro_mask_thre: float = 1e-4
    entro_use_weighting: bool = False
    entro_weighted_thresh: float = 0.0
    entro_clip_threshold: float = 1e-19
    occl_reg_perc: float = 0.1
    # reference parity keeps the use_back=False FULL-RAY occlusion quirk
    # (losses.py::occlusion_loss docstring); front_only applies the
    # documented near-camera intent instead — the full-ray L1 is what
    # crushes mid-ray dynamic vessel mass at the 4-view operating point
    occl_front_only: bool = False
    compute_dtype: str = "float32"
    # sub-pixel ray jitter (world angular units, ~pixel footprint
    # dDetector/DSD x the configured fraction): each iteration perturbs
    # the sampled rays perpendicular to their direction, turning exact-ray
    # line supervision into pixel-cone supervision. Depth stratification
    # cannot stop lateral memorization streaks at extreme sparsity; this
    # does. 0 = off (reference behavior). Train-time only — eval renders
    # pixel centers.
    ray_jitter: float = 0.0
    use_pallas: bool = False
    pallas_tile: int = 1024
    # scoped-VMEM ceiling for the fused kernel in MiB (0 = compiler
    # default, 16 MiB); tiles >= 4096 need ~27 MiB of stack — v5e has
    # 128 MiB of VMEM, so raising this trades pipelining headroom for
    # bigger tiles
    pallas_vmem_mb: int = 0
    # store the fused kernel's backward residuals (post-ReLU activations)
    # in bf16: halves residual VMEM — the quantity that gates tile size
    # and Mosaic's pipelining headroom. Near-neutral numerically on
    # hardware: the MXU's default f32-matmul precision already feeds the
    # dW matmuls bf16 operands; only the ReLU sign masks see the cast
    # (sign flips require |pre| below bf16 subnormals).
    pallas_bf16_residuals: bool = False
    # monolithic train-gradient kernel (render + losses + backprop in one
    # Pallas pass; coarse path only — see ops/pallas/fused_train.py)
    use_fused_loss: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def field_window(cfg: FieldConfig, step):
    """Per-band annealing window for a field at ``step`` (None if N/A)."""
    if cfg.pos_enc == "free_windowed":
        return free_window_mask(
            cfg.pos_enc_basis,
            step,
            cfg.pos_enc_window_decay_steps,
            cfg.pos_enc_window_start,
            cfg.pos_enc_window_max,
        )
    if cfg.pos_enc == "nerfies_windowed":
        alpha = nerfies_alpha(cfg.pos_enc_basis, step, cfg.pos_enc_window_decay_steps)
        if cfg.pos_enc_window_max > 0:
            alpha = jnp.minimum(alpha, cfg.pos_enc_window_max)
        return nerfies_window(cfg.pos_enc_basis, alpha)
    return None


def window_alpha(cfg: FieldConfig, step):
    """The scalar logged as ``train_*_windowed`` (``run_composite.py:338-341``)."""
    if cfg.pos_enc == "free_windowed":
        return free_window_alpha(
            cfg.pos_enc_basis,
            step,
            cfg.pos_enc_window_decay_steps,
            cfg.pos_enc_window_start,
            cfg.pos_enc_window_max,
        )
    if cfg.pos_enc == "nerfies_windowed":
        alpha = nerfies_alpha(cfg.pos_enc_basis, step, cfg.pos_enc_window_decay_steps)
        if cfg.pos_enc_window_max > 0:
            alpha = jnp.minimum(alpha, cfg.pos_enc_window_max)
        return alpha
    return jnp.zeros(())


def jitter_directions(key, d, jitter: float):
    """Perturb unit-depth ray directions ``d [n, 3]`` by a uniform
    sub-pixel offset perpendicular to each ray.

    ``jitter`` is the full lateral footprint in angular units
    (``dDetector/DSD`` = one pixel); offsets span ``[-jitter/2, jitter/2]``
    in two perpendicular axes, so ``jitter = pixel angle`` supervises the
    full pixel cone. The perturbation is perpendicular to ``d``, so the
    unit-depth parameterization (``points = o + z*d``) keeps its depth
    scale to O(jitter^2).
    """
    up = jnp.where(
        jnp.abs(d[:, 2:3]) < 0.9,
        jnp.asarray([0.0, 0.0, 1.0], d.dtype),
        jnp.asarray([1.0, 0.0, 0.0], d.dtype),
    )
    e1 = jnp.cross(d, jnp.broadcast_to(up, d.shape))
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = jnp.cross(d, e1)
    e2 = e2 / jnp.linalg.norm(e2, axis=-1, keepdims=True)
    u = (jax.random.uniform(key, (d.shape[0], 2), d.dtype) - 0.5) * jitter
    return d + u[:, 0:1] * e1 + u[:, 1:2] * e2


def sample_ray_batch(key, rays, phases, var_ids, non_var_ids, hp: CompositeHParams):
    """On-device batch sampling with variance-ray oversampling
    (``run_composite.py:250-263``). Sampling is with replacement, matching
    the reference's ``np.random.randint`` draws over the id sets."""
    n = hp.img_sample_size
    if hp.nb_var_rays > 0 and var_ids is not None:
        k1, k2 = jax.random.split(key)
        nv = hp.nb_var_rays
        iv = jax.random.randint(k1, (nv,), 0, var_ids.shape[0])
        inv = jax.random.randint(k2, (n - nv,), 0, non_var_ids.shape[0])
        idx = jnp.concatenate([var_ids[iv], non_var_ids[inv]])
    else:
        idx = jax.random.randint(key, (n,), 0, rays.shape[0])
    batch = rays[idx]  # [n, 4, 3]
    return {
        "origins": batch[:, 0, :],
        "directions": batch[:, 1, :],
        "pixels": batch[:, 2, 0],
        "weights": batch[:, 3, 0],
        "phases": phases[idx],
    }


def evaluate_composite(
    params,
    points,
    point_phases,
    cfgs: dict,
    windows,
    hp: CompositeHParams,
    suffix: str = "",
):
    """Evaluate both fields on ``points [R, S, 3]`` with per-point phases.

    ``cfgs``: FieldConfig per param group ('static', 'temp', and '_fine'
    variants when the hierarchy is on — fine models have their own widths,
    ``run_composite.py:196-209``)."""
    static_cfg = cfgs["static" + suffix]
    temp_cfg = cfgs["temp" + suffix]
    from nerfca_tpu.ops.pallas.fused_field import pallas_supported

    if hp.use_pallas and pallas_supported(static_cfg) and pallas_supported(
        temp_cfg
    ):
        from nerfca_tpu.ops.pallas.fused_field import (
            fused_composite_fields,
        )

        return fused_composite_fields(
            params["static" + suffix],
            params["temp" + suffix],
            points,
            point_phases,
            static_cfg,
            temp_cfg,
            windows["static"],
            windows["temp"],
            tile=hp.pallas_tile,
            compute_dtype=hp.compute_dtype,
        )
    static_raw = apply_static_field(
        params["static" + suffix], points, static_cfg,
        window=windows["static"], compute_dtype=hp.dtype,
    )
    temp_raw = apply_temporal_field(
        params["temp" + suffix], points, point_phases, temp_cfg,
        window=windows["temp"], compute_dtype=hp.dtype,
    )
    return static_raw, temp_raw


def composite_forward(
    params,
    batch,
    depth_values,
    windows,
    cfgs: dict,
    hp: CompositeHParams,
    rng: Optional[jax.Array] = None,
    hull=None,
):
    """Coarse (+optional fine) forward pass -> renders and sigmas.

    ``depth_values``: the already-jittered shared ``[S]`` vector.
    ``hull``: optional ``ops.hull.MotionHull`` gating the dynamic density
    (framework extension; None preserves reference behavior exactly).
    Mirrors ``model_helpers.py:115-160``.
    """
    from nerfca_tpu.ops.pallas.fused_field import pallas_supported

    origins, dirs = batch["origins"], batch["directions"]
    i0 = batch["initial_intensities"]
    n_rays = origins.shape[0]
    # per-pass gating: each pass rides the fused kernel only when ITS
    # config pair is inside the kernel envelope, so e.g. reduced-width
    # fine fields fall back to XLA without costing the coarse pass
    if hp.use_pallas and pallas_supported(cfgs["static"]) and pallas_supported(
        cfgs["temp"]
    ):
        # ray-form fused path: never materializes [R*S, 3] points (TPU pads
        # minor-dim-3 arrays 42x; see the kernel module docstring)
        from nerfca_tpu.ops.pallas.fused_field import fused_composite_fields_rays

        z_rs = jnp.broadcast_to(depth_values, (n_rays, depth_values.shape[0]))
        static_raw, temp_raw = fused_composite_fields_rays(
            params["static"], params["temp"], origins, dirs, z_rs,
            batch["phases"], cfgs["static"], cfgs["temp"],
            windows["static"], windows["temp"],
            tile=hp.pallas_tile, compute_dtype=hp.compute_dtype,
        )
    else:
        pts = origins[:, None, :] + dirs[:, None, :] * depth_values[:, None]
        point_phases = jnp.broadcast_to(
            batch["phases"][:, None], pts.shape[:2]
        ).astype(jnp.int32)
        static_raw, temp_raw = evaluate_composite(
            params, pts, point_phases, cfgs, windows, hp
        )
    temp_gate = None
    if hull is not None:
        from nerfca_tpu.ops.hull import hull_gate_rays

        temp_gate = hull_gate_rays(hull, origins, dirs, depth_values)
    pix_c, s_sig_c, t_sig_c, dists_c = render_transmission_composite(
        static_raw, temp_raw, i0, depth_values, hp.output_activation,
        temp_gate=temp_gate,
    )
    out = {
        "pix_coarse": pix_c,
        "static_sigma_coarse": s_sig_c,
        "temp_sigma_coarse": t_sig_c,
        "dists_coarse": dists_c,
        "static_raw_coarse": static_raw,
        "temp_raw_coarse": temp_raw,
    }
    if temp_gate is not None:
        out["temp_gate_coarse"] = temp_gate  # reused by the hull-gated L1

    if hp.depth_samples_fine > 0:
        # fine-sample weights from adjacent total-density differences
        # (model_helpers.py:135-139)
        total = s_sig_c + t_sig_c
        eps = jnp.full_like(total[:, :1], 1e-10)
        w = jnp.concatenate([eps, jnp.abs(total[:, 1:] - total[:, :-1])], axis=-1)
        w = w / jnp.max(w)
        z = jnp.broadcast_to(depth_values, (origins.shape[0], depth_values.shape[0]))
        z_mid = 0.5 * (z[:, 1:] + z[:, :-1])
        z_pdf = sample_pdf(rng, z_mid, w[:, 1:-1], hp.depth_samples_fine)
        z_fine = jnp.sort(jnp.concatenate([z_pdf, z], axis=-1), axis=-1)
        s_total = hp.depth_samples_coarse + hp.depth_samples_fine
        if hp.use_pallas and pallas_supported(
            cfgs["static_fine"]
        ) and pallas_supported(cfgs["temp_fine"]):
            from nerfca_tpu.ops.pallas.fused_field import (
                fused_composite_fields_rays,
            )

            static_raw_f, temp_raw_f = fused_composite_fields_rays(
                params["static_fine"], params["temp_fine"], origins, dirs,
                z_fine, batch["phases"], cfgs["static_fine"],
                cfgs["temp_fine"], windows["static"], windows["temp"],
                tile=hp.pallas_tile, compute_dtype=hp.compute_dtype,
            )
        else:
            pts_f = origins[:, None, :] + dirs[:, None, :] * z_fine[..., None]
            phases_f = jnp.broadcast_to(
                batch["phases"][:, None], (origins.shape[0], s_total)
            ).astype(jnp.int32)
            static_raw_f, temp_raw_f = evaluate_composite(
                params, pts_f, phases_f, cfgs, windows, hp, suffix="_fine",
            )
        temp_gate_f = None
        if hull is not None:
            from nerfca_tpu.ops.hull import hull_gate_rays

            temp_gate_f = hull_gate_rays(hull, origins, dirs, z_fine)
        # reference renders the fine pass with ray 0's sorted depths
        # (model_helpers.py:147 depth_vals_fine[0, :])
        pix_f, s_sig_f, t_sig_f, dists_f = render_transmission_composite(
            static_raw_f, temp_raw_f, i0, z_fine[0], hp.output_activation,
            temp_gate=temp_gate_f,
        )
        out.update(
            pix_fine=pix_f,
            static_sigma_fine=s_sig_f,
            temp_sigma_fine=t_sig_f,
            dists_fine=dists_f,
        )
    return out


def _regularized_loss(pix_loss, losses, weights):
    return (
        pix_loss
        + weights["favor_s"] * losses.favor_s_loss
        + weights["dynamic_entro"] * losses.dynamic_entropy_loss
        + weights["occl"] * losses.dynamic_occl_loss
        + weights["l1"] * losses.static_l2_loss
        + weights["l1"] * losses.static_l1_loss
    )


def schedule_from_hp(hp: CompositeHParams) -> dict:
    """The loss-weight schedule as a flat dict of scalars.

    Passed as a TRACED input to the train step (``sched``), so sweeping
    regularizer weights reuses one compiled step — a fresh XLA compile
    costs minutes through this machine's remote tunnel, which made
    weight sweeps impractical when the weights were baked in as
    constants."""
    return {
        "favor_s_start": jnp.float32(hp.favor_s_weight_start),
        "favor_s_end": jnp.float32(hp.favor_s_weight_end),
        "favor_s_delay": jnp.float32(hp.favor_s_weight_delay_steps),
        "d_entro_start": jnp.float32(hp.dynamic_entro_weight_start),
        "d_entro_end": jnp.float32(hp.dynamic_entro_weight_end),
        "occl_start": jnp.float32(hp.occl_weight_start),
        "occl_end": jnp.float32(hp.occl_weight_end),
        "l1_start": jnp.float32(hp.l1_weight_start),
        "l1_end": jnp.float32(hp.l1_weight_end),
        "hl1_start": jnp.float32(hp.hull_static_l1_weight_start),
        "hl1_end": jnp.float32(hp.hull_static_l1_weight_end),
        "stv_start": jnp.float32(hp.static_tv_weight_start),
        "stv_end": jnp.float32(hp.static_tv_weight_end),
        "decay_steps": jnp.float32(hp.hyperparam_decay_steps),
        "static_freeze": jnp.float32(hp.static_freeze_step),
    }


def weightless_hp(hp: CompositeHParams) -> CompositeHParams:
    """Canonicalize the schedule fields that are NOT part of a compiled
    graph when the schedule rides in as the traced ``sched`` input — used
    as (part of) compiled-function cache keys so weight sweeps share one
    compile."""
    import dataclasses as _dc

    return _dc.replace(
        hp,
        favor_s_weight_start=0.0, favor_s_weight_end=0.0,
        favor_s_weight_delay_steps=0,
        dynamic_entro_weight_start=0.0, dynamic_entro_weight_end=0.0,
        occl_weight_start=0.0, occl_weight_end=0.0,
        l1_weight_start=0.0, l1_weight_end=0.0,
        hull_static_l1_weight_start=0.0, hull_static_l1_weight_end=0.0,
        # static TV changes the GRAPH (its branch is a trace-time `if`,
        # and a non-zero weight exits the fused envelope), so the cache
        # key keeps the on/off bit and shares compiles across values only
        static_tv_weight_start=(
            0.0 if (hp.static_tv_weight_start == 0.0
                    and hp.static_tv_weight_end == 0.0) else 1.0),
        static_tv_weight_end=0.0,
        hyperparam_decay_steps=1,
        static_freeze_step=0,
        ray_jitter=0.0,  # train-time only; render graphs never read it
    )


def loss_weights(step, hp: CompositeHParams, sched=None):
    """Annealed loss weights (``run_composite.py:276-279``). The occlusion
    weight shares the favor_s delay, as in the reference. With ``sched``
    (see :func:`schedule_from_hp`) the weights come from traced values."""
    if sched is None:
        sched = schedule_from_hp(hp)
    return {
        "favor_s": linear_param_decay(
            step, sched["favor_s_start"], sched["favor_s_end"],
            sched["decay_steps"], sched["favor_s_delay"],
        ),
        "dynamic_entro": linear_param_decay(
            step, sched["d_entro_start"], sched["d_entro_end"],
            sched["decay_steps"],
        ),
        "occl": linear_param_decay(
            step, sched["occl_start"], sched["occl_end"],
            sched["decay_steps"], sched["favor_s_delay"],
        ),
        "l1": linear_param_decay(
            step, sched["l1_start"], sched["l1_end"], sched["decay_steps"]
        ),
        "hull_static_l1": linear_param_decay(
            step, sched["hl1_start"], sched["hl1_end"], sched["decay_steps"]
        ),
        "static_tv": linear_param_decay(
            step, sched.get("stv_start", jnp.float32(0.0)),
            sched.get("stv_end", jnp.float32(0.0)), sched["decay_steps"]
        ),
    }


def composite_loss_fn(
    params,
    batch,
    depth_values,
    step,
    cfgs: dict,
    hp: CompositeHParams,
    rng: Optional[jax.Array] = None,
    sched=None,
    hull=None,
):
    """Total regularized loss + metric dict for one batch. ``sched``: traced
    loss-weight schedule (see :func:`schedule_from_hp`); None bakes the hp
    values in as constants. ``hull``: optional motion-hull gate."""
    windows = {
        "static": field_window(cfgs["static"], step),
        "temp": field_window(cfgs["temp"], step),
    }
    fwd = composite_forward(
        params, batch, depth_values, windows, cfgs, hp, rng, hull=hull
    )
    weights = loss_weights(step, hp, sched)

    pixel_loss_c = jnp.mean(
        weighted_mse(fwd["pix_coarse"], batch["pixels"], batch["weights"])
    )
    losses = composite_losses(
        fwd["static_sigma_coarse"],
        fwd["temp_sigma_coarse"],
        fwd["dists_coarse"],
        batch["weights"],
        skewness_val=hp.skewness_val,
        entro_mask_thre=hp.entro_mask_thre,
        entro_use_weighting=hp.entro_use_weighting,
        entro_weighted_thresh=hp.entro_weighted_thresh,
        occl_reg_perc=hp.occl_reg_perc,
        entro_clip_threshold=hp.entro_clip_threshold,
        occl_front_only=hp.occl_front_only,
    )
    loss = _regularized_loss(pixel_loss_c, losses, weights)
    static_tv = jnp.float32(0.0)
    if hp.static_tv_weight_start > 0 or hp.static_tv_weight_end > 0:
        # along-ray TV on the static field (see CompositeHParams.
        # static_tv_*); XLA path only — fused_train_supported() rejects
        # a non-zero weight so this branch is always live when enabled
        static_tv = along_ray_tv(fwd["static_sigma_coarse"])
        loss = loss + weights["static_tv"] * static_tv
    hull_s_l1 = jnp.float32(0.0)
    if hull is not None:
        # hull-gated static L1 (see CompositeHParams.hull_static_l1_*):
        # mean over rays of the static line integral inside the hull
        hull_s_l1 = jnp.mean(
            jnp.sum(
                fwd["static_sigma_coarse"]
                * fwd["dists_coarse"]
                * fwd["temp_gate_coarse"],
                axis=-1,
            )
        )
        loss = loss + weights["hull_static_l1"] * hull_s_l1

    metrics = {
        "train_hull_s_l1": hull_s_l1,
        "hull_static_l1_weight": weights["hull_static_l1"],
        "train_static_tv": static_tv,
        "static_tv_weight": weights["static_tv"],
        "train_pixel_loss_coarse": pixel_loss_c,
        "train_blendw": losses.blendw_mean,
        "train_sigma_s_max": losses.sigma_s_max,
        "train_sigma_d_max": losses.sigma_d_max,
        "train_favor_s_loss": losses.favor_s_loss,
        "train_s_entropy_loss": losses.static_entropy_loss,
        "train_d_entropy_loss": losses.dynamic_entropy_loss,
        "train_s_entropy_sum": losses.static_entropy_sum,
        "train_d_entropy_sum": losses.dynamic_entropy_sum,
        "train_d_occl_loss": losses.dynamic_occl_loss,
        "train_s_l1": losses.static_l1_loss,
        "train_s_l2": losses.static_l2_loss,
        "favor_s_weight": weights["favor_s"],
        "dynamic_entro_weight": weights["dynamic_entro"],
        "occl_weight": weights["occl"],
        "l1_weight": weights["l1"],
        "train_static_windowed": window_alpha(cfgs["static"], step),
        "train_temp_windowed": window_alpha(cfgs["temp"], step),
    }

    if hp.depth_samples_fine > 0:
        # fine pass uses UNIT pixel weights (run_composite.py:296-301)
        pixel_loss_f = jnp.mean(
            weighted_mse(
                fwd["pix_fine"], batch["pixels"], jnp.ones_like(batch["weights"])
            )
        )
        losses_f = composite_losses(
            fwd["static_sigma_fine"],
            fwd["temp_sigma_fine"],
            fwd["dists_fine"],
            batch["weights"],
            skewness_val=hp.skewness_val,
            entro_mask_thre=hp.entro_mask_thre,
            entro_use_weighting=hp.entro_use_weighting,
            entro_weighted_thresh=hp.entro_weighted_thresh,
            occl_reg_perc=hp.occl_reg_perc,
            entro_clip_threshold=hp.entro_clip_threshold,
            occl_front_only=hp.occl_front_only,
        )
        loss = loss + _regularized_loss(pixel_loss_f, losses_f, weights)
        metrics["train_pixel_loss_fine"] = pixel_loss_f
        # the reference overwrites the logged regularizer metrics with the
        # fine pass values (run_composite.py:298-301)
        metrics.update(
            train_favor_s_loss=losses_f.favor_s_loss,
            train_d_entropy_loss=losses_f.dynamic_entropy_loss,
        )

    metrics["train_loss"] = loss
    metrics["train_psnr"] = -10.0 * jnp.log10(loss)
    return loss, metrics


def make_composite_train_step(
    cfgs: dict,
    hp: CompositeHParams,
    tx: optax.GradientTransformation,
    depth_values_base,
    initial_intensity: float,
    batch_sharding=None,
):
    """Build the single-iteration update function (not yet jitted)."""
    s_fine = hp.depth_samples_fine

    import functools

    from nerfca_tpu.ops.pallas.fused_train import (
        fused_train_loss_and_grads,
        fused_train_loss_and_grads_sharded,
        fused_train_supported,
    )

    rt = _fused_rays_per_tile(hp, depth_values_base.shape[0])
    # Under data parallelism the kernel runs per-shard inside shard_map
    # (fused_train_loss_and_grads_sharded), so each shard's ray count must
    # still tile evenly.
    batch_axis = None
    n_shards = 1
    if batch_sharding is not None and len(batch_sharding.spec) > 0:
        batch_axis = batch_sharding.spec[0]
        if batch_axis is not None:
            n_shards = batch_sharding.mesh.shape[batch_axis]
    fused = (
        fused_train_supported(cfgs["static"], cfgs["temp"], hp)
        and hp.img_sample_size % (rt * n_shards) == 0
    )
    if fused and batch_axis is not None:
        fused_fn = functools.partial(
            fused_train_loss_and_grads_sharded, batch_sharding.mesh,
            batch_axis,
        )
    else:
        fused_fn = fused_train_loss_and_grads

    def train_step(state: TrainState, rays, phases, var_ids, non_var_ids,
                   sched=None, hull=None):
        rng, k_sample, k_depth, k_fine = jax.random.split(state.rng, 4)

        batch = sample_ray_batch(k_sample, rays, phases, var_ids, non_var_ids, hp)
        if hp.ray_jitter > 0:
            # derive the jitter key from k_fine so the rng stream (and the
            # bitwise trajectory of existing runs) is unchanged when off
            k_jit = jax.random.fold_in(k_fine, 1)
            batch["directions"] = jitter_directions(
                k_jit, batch["directions"], hp.ray_jitter
            )
        if batch_sharding is not None:
            batch = {
                k: jax.lax.with_sharding_constraint(v, batch_sharding)
                for k, v in batch.items()
            }
        batch["initial_intensities"] = jnp.full(
            (hp.img_sample_size,), initial_intensity, jnp.float32
        )

        z = stratify_depths(k_depth, depth_values_base)

        if fused:
            loss, metrics, grads = _fused_loss_metrics_grads(
                state.params, batch, z, state.step, cfgs, hp, sched,
                fused_fn, rt, hull=hull,
            )
        else:
            def lf(p):
                return composite_loss_fn(
                    p, batch, z, state.step, cfgs, hp,
                    rng=k_fine if s_fine > 0 else None,
                    sched=sched, hull=hull,
                )

            (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
                state.params
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # static-field freeze (traced; 0 = off): past the freeze step the
        # static subtree's updates are zeroed while the dynamic field
        # keeps training — see CompositeHParams.static_freeze_step
        freeze = (sched or schedule_from_hp(hp))["static_freeze"]
        gate = jnp.where(
            (freeze > 0) & (state.step.astype(jnp.float32) >= freeze),
            0.0, 1.0,
        )
        updates = {
            k: jax.tree.map(lambda u: u * gate, v)
            if k.startswith("static") else v
            for k, v in updates.items()
        }
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, opt_state, state.step + 1, rng)
        return new_state, metrics

    return train_step


def _fused_rays_per_tile(hp, n_depth_samples: int) -> int:
    """Rays per kernel tile from the configured tile size (s_pad granularity
    is 512; pallas_tile 1024 -> 2 rays, 2048 -> 4). Shared with the fused-path
    gate so img_sample_size divisibility is checked against the ACTUAL rt."""
    s_pad = ((n_depth_samples + 511) // 512) * 512
    return max(2, hp.pallas_tile // s_pad) if hp.pallas_tile >= 2 * s_pad else 2


def _fused_loss_metrics_grads(params, batch, z, step, cfgs, hp, sched,
                              fused_fn, rt, hull=None):
    """Run the monolithic train-gradient kernel and assemble the SAME
    metrics dict composite_loss_fn produces (names and semantics)."""
    windows = {
        "static": field_window(cfgs["static"], step),
        "temp": field_window(cfgs["temp"], step),
    }
    weights = loss_weights(step, hp, sched)
    lw = jnp.stack(
        [weights["favor_s"], weights["dynamic_entro"], weights["occl"],
         weights["l1"], weights["hull_static_l1"]]
    )
    loss, terms, g_s, g_t = fused_fn(
        params["static"], params["temp"],
        batch["origins"], batch["directions"], z, batch["phases"],
        batch["pixels"], batch["weights"], batch["initial_intensities"],
        cfgs["static"], cfgs["temp"], windows["static"], windows["temp"],
        lw, hp, rays_per_tile=rt, hull=hull,
    )
    metrics = {
        "train_pixel_loss_coarse": terms["pixel_loss"],
        "train_blendw": terms["blendw"],
        "train_sigma_s_max": terms["sigma_s_max"],
        "train_sigma_d_max": terms["sigma_d_max"],
        "train_favor_s_loss": terms["favor_s"],
        "train_s_entropy_loss": terms["s_entropy"],
        "train_d_entropy_loss": terms["d_entropy"],
        "train_s_entropy_sum": terms["s_entropy_sum"],
        "train_d_entropy_sum": terms["d_entropy_sum"],
        "train_d_occl_loss": terms["occl"],
        "train_s_l1": terms["l1"],
        "train_s_l2": terms["l2"],
        "train_hull_s_l1": terms["hull_s_l1"],
        "favor_s_weight": weights["favor_s"],
        "dynamic_entro_weight": weights["dynamic_entro"],
        "occl_weight": weights["occl"],
        "l1_weight": weights["l1"],
        "hull_static_l1_weight": weights["hull_static_l1"],
        "train_static_windowed": window_alpha(cfgs["static"], step),
        "train_temp_windowed": window_alpha(cfgs["temp"], step),
        "train_loss": loss,
        "train_psnr": -10.0 * jnp.log10(loss),
    }
    return loss, metrics, {"static": g_s, "temp": g_t}


def make_train_chunk(train_step, n_steps: int):
    """Scan ``n_steps`` iterations in one device dispatch; metrics stack to
    ``[n_steps]`` per key for host-side logging and early-stop checks.

    The chunk optionally takes ``n_valid`` (a traced integer): steps with
    ``i >= n_valid`` become state-preserving no-ops, so a shorter tail chunk
    (e.g. the +1 of the reference's ``range(n_iters+1)`` loop,
    ``run_composite.py:227``) reuses the SAME compiled graph instead of
    re-jitting a shorter scan — a fresh compile costs minutes through the
    remote-compile tunnel. The select touches only the small state pytree
    (~MBs), negligible next to the step itself."""

    def chunk(state, rays, phases, var_ids, non_var_ids, n_valid=None,
              sched=None, hull=None):
        def body(st, i):
            new_st, metrics = train_step(
                st, rays, phases, var_ids, non_var_ids, sched, hull
            )
            if n_valid is not None:
                keep = i < n_valid
                new_st = jax.tree.map(
                    lambda a, b: jnp.where(keep, a, b), new_st, st
                )
            return new_st, metrics

        return jax.lax.scan(body, state, jnp.arange(n_steps))

    return chunk


# ---------------------------------------------------------------------------
# Static (3-D, run_nerf) variant


@dataclasses.dataclass(frozen=True)
class StaticHParams:
    """Hyperparameters of the static single-field method
    (``train/3d.txt``, ``run_nerf.py:224-237``)."""

    img_sample_size: int = 1024
    nb_var_rays: int = 0
    depth_samples_coarse: int = 500
    output_activation: str = "softplus"
    occl_weight_start: float = 1e-4
    occl_reg_perc: float = 0.1
    occl_front_only: bool = False
    compute_dtype: str = "float32"
    use_pallas: bool = False

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def static_loss_fn(params, batch, depth_values, step, cfg: FieldConfig, hp: StaticHParams):
    """Pixel + occlusion loss of the static method (``run_nerf.py:224-231``).

    The occlusion term consumes the UNSCALED sigma from the single-field
    renderer — reference behavior."""
    window = field_window(cfg, step)
    origins, dirs = batch["origins"], batch["directions"]
    pts = origins[:, None, :] + dirs[:, None, :] * depth_values[:, None]
    from nerfca_tpu.ops.pallas.fused_field import pallas_supported

    if hp.use_pallas and pallas_supported(cfg):
        from nerfca_tpu.ops.pallas.fused_field import fused_static_field

        raw = fused_static_field(params["static"], pts, cfg, window)
    else:
        raw = apply_static_field(
            params["static"], pts, cfg, window=window, compute_dtype=hp.dtype
        )
    pix, sigma, dists = render_transmission(
        raw, batch["initial_intensities"], depth_values, hp.output_activation
    )
    pixel_loss = jnp.mean(weighted_mse(pix, batch["pixels"], batch["weights"]))
    occl = occlusion_loss(
        sigma, dists, hp.occl_reg_perc, front_only=hp.occl_front_only
    )
    loss = pixel_loss + hp.occl_weight_start * occl
    metrics = {
        "train_loss": loss,
        "train_psnr": -10.0 * jnp.log10(loss),
        "train_pixel_loss": pixel_loss,
        "train_occl_loss": occl,
        "train_static_windowed": window_alpha(cfg, step),
    }
    return loss, metrics


def make_static_train_step(
    cfg: FieldConfig,
    hp: StaticHParams,
    tx: optax.GradientTransformation,
    depth_values_base,
    initial_intensity: float,
    batch_sharding=None,
):
    comp_hp = CompositeHParams(
        img_sample_size=hp.img_sample_size, nb_var_rays=hp.nb_var_rays
    )

    def train_step(state: TrainState, rays, phases, var_ids, non_var_ids,
                   sched=None, hull=None):
        del sched, hull  # static method has neither traced schedules nor a hull
        rng, k_sample, k_depth = jax.random.split(state.rng, 3)
        batch = sample_ray_batch(
            k_sample, rays, phases, var_ids, non_var_ids, comp_hp
        )
        if batch_sharding is not None:
            batch = {
                k: jax.lax.with_sharding_constraint(v, batch_sharding)
                for k, v in batch.items()
            }
        batch["initial_intensities"] = jnp.full(
            (hp.img_sample_size,), initial_intensity, jnp.float32
        )
        z = stratify_depths(k_depth, depth_values_base)

        def lf(p):
            return static_loss_fn(p, batch, z, state.step, cfg, hp)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1, rng), metrics

    return train_step


def make_optimizer(lr: float, lr_end_factor: float, lr_decay_steps: int,
                   weight_decay: float = 0.0):
    """Adam with linear LR decay — PyTorch Adam defaults + LinearLR
    semantics (``run_composite.py:205-212``).

    ``weight_decay``: optional decoupled (AdamW-style) decay on the MLP
    weight matrices only (``w`` leaves — biases and time latents are
    exempt). Framework extension, default 0.0 = exact
    reference optimizer. Motivation: at 4 training views the static CPPN
    memorizes the train views as axis-aligned stripe patterns on held-out
    views once its encoding window opens (XCAT-SURR step-6000 panels,
    round 5); decay on the weight matrices is the standard counter."""
    schedule = optax.linear_schedule(
        init_value=lr, end_value=lr * lr_end_factor, transition_steps=lr_decay_steps
    )
    if not weight_decay:
        return optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8)

    def mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(k, "key", None) == "w" for k in path
            ),
            params,
        )

    return optax.adamw(
        learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay, mask=mask,
    )
