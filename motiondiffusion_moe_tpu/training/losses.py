"""Training losses.

- ``masked_frame_mse`` matches the reference's live loss exactly
  (``trainers/ddpm_trainer.py:201-217``): per-frame feature-mean MSE,
  masked by the frame-validity mask, normalized by the mask sum.
- The "advanced" losses (progressive denoising, motion structure, physics
  prior, temporal coherence) are advertised by the reference README
  (``README.md:24-31,97-129``) but DO NOT EXIST in its code (SURVEY.md §6
  caveat a). They are implemented here for real, as optional weighted terms
  operating on the predicted x0 (derived from the eps prediction), since
  BASELINE.json lists them in the north star.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from motiondiffusion_moe_tpu.motion.recover import recover_from_ric


def masked_frame_mse(pred: jnp.ndarray, target: jnp.ndarray,
                     src_mask: jnp.ndarray,
                     sample_weight: Optional[jnp.ndarray] = None,
                     ) -> jnp.ndarray:
    """((pred-target)^2 .mean(-1) * mask).sum() / mask.sum()
    (``ddpm_trainer.py:208-213``). ``src_mask``: [B, T].

    ``sample_weight`` [B] carries schedule-sampler importance weights
    (1/(T*q(t))): the numerator is weighted per sample so a non-uniform
    sampler still optimizes an unbiased estimate of the uniform objective.
    All-ones weights reproduce the reference loss bit-for-bit. (The
    reference computes but discards these weights, ``ddpm_trainer.py:119`` —
    its loss-aware samplers train on a biased objective; divergence
    documented in DIVERGENCES.md.)
    """
    per_frame = jnp.mean((pred - target) ** 2, axis=-1)
    if sample_weight is not None:
        per_frame = per_frame * sample_weight[:, None].astype(per_frame.dtype)
    return jnp.sum(per_frame * src_mask) / jnp.maximum(jnp.sum(src_mask), 1.0)


def _pair_mask(src_mask: jnp.ndarray, order: int) -> jnp.ndarray:
    """Mask for order-th finite differences: valid where all frames in the
    stencil are valid."""
    m = src_mask
    for _ in range(order):
        m = m[:, 1:] * m[:, :-1]
    return m


def velocity_loss(pred_x0: jnp.ndarray, target_x0: jnp.ndarray,
                  src_mask: jnp.ndarray) -> jnp.ndarray:
    """Temporal-coherence loss: MSE of first temporal differences."""
    dv_pred = pred_x0[:, 1:] - pred_x0[:, :-1]
    dv_tgt = target_x0[:, 1:] - target_x0[:, :-1]
    return masked_frame_mse(dv_pred, dv_tgt, _pair_mask(src_mask, 1))


def acceleration_loss(pred_x0: jnp.ndarray, target_x0: jnp.ndarray,
                      src_mask: jnp.ndarray) -> jnp.ndarray:
    """Physics-prior loss: MSE of second temporal differences (penalizes
    non-physical jerk in the prediction relative to data)."""
    a_pred = pred_x0[:, 2:] - 2 * pred_x0[:, 1:-1] + pred_x0[:, :-2]
    a_tgt = target_x0[:, 2:] - 2 * target_x0[:, 1:-1] + target_x0[:, :-2]
    return masked_frame_mse(a_pred, a_tgt, _pair_mask(src_mask, 2))


def structure_loss(pred_x0: jnp.ndarray, target_x0: jnp.ndarray,
                   src_mask: jnp.ndarray, joints_num: int,
                   parents: Optional[tuple] = None) -> jnp.ndarray:
    """Motion-structure loss: bone-length consistency in joint space.

    Decodes both predictions through the differentiable ric decoder and
    penalizes deviation of predicted bone lengths from the target's.
    ``pred_x0``/``target_x0`` must be in DENORMALIZED feature space.
    """
    pj = recover_from_ric(pred_x0, joints_num)     # [B, T, J, 3]
    tj = recover_from_ric(target_x0, joints_num)
    if parents is None:
        # generic: use consecutive-joint distances as a structure proxy
        pb = jnp.linalg.norm(pj[:, :, 1:] - pj[:, :, :-1], axis=-1)
        tb = jnp.linalg.norm(tj[:, :, 1:] - tj[:, :, :-1], axis=-1)
    else:
        idx = jnp.asarray([j for j in range(1, joints_num)])
        par = jnp.asarray([parents[j] for j in range(1, joints_num)])
        pb = jnp.linalg.norm(pj[:, :, idx] - pj[:, :, par], axis=-1)
        tb = jnp.linalg.norm(tj[:, :, idx] - tj[:, :, par], axis=-1)
    per_frame = jnp.mean((pb - tb) ** 2, axis=-1)
    return jnp.sum(per_frame * src_mask) / jnp.maximum(jnp.sum(src_mask), 1.0)


def progressive_loss(pred_x0: jnp.ndarray, target_x0: jnp.ndarray,
                     src_mask: jnp.ndarray, num_scales: int = 2) -> jnp.ndarray:
    """Progressive (multi-scale) denoising loss: MSE agreement at temporally
    average-pooled scales (stride-2 per level), mirroring the model's
    2-scale U-Net."""
    loss = 0.0
    p, t, m = pred_x0, target_x0, src_mask
    for _ in range(num_scales):
        T2 = (p.shape[1] // 2) * 2
        p = 0.5 * (p[:, 0:T2:2] + p[:, 1:T2:2])
        t = 0.5 * (t[:, 0:T2:2] + t[:, 1:T2:2])
        m = m[:, 0:T2:2] * m[:, 1:T2:2]
        loss = loss + masked_frame_mse(p, t, m)
    return loss / num_scales
