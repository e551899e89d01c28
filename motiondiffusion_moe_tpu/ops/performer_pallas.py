"""Fused FAVOR+ (Performer) attention core as a Pallas TPU kernel.

The hot inner op of the denoiser's self-attention
(``text2motion/models/fast_attention.py:58-92``): exp feature maps of q and
k, the kv and qkv einsums, and the (reference-quirk, same-position)
denominator — fused into ONE kernel so the [T, m] feature maps never round-
trip through HBM. Numerics match
:class:`motiondiffusion_moe_tpu.models.attention.FastAttention`'s inner math
exactly (0.1 scalings, +-15 clamp, float32 feature maps).

Training uses a custom VJP whose backward differentiates the pure-JAX
reference implementation (one recompute; simple and exactly consistent),
while the forward runs the fused kernel.

Grid: one program per (batch*head). Blocks: full [T, D]/[T, m] panels in
VMEM — at the flagship shape (T=196->pad 256, D=128, m=256) that is
~0.6 MB, far under the ~16 MB VMEM budget.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def favor_attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              projection: jnp.ndarray,
                              mask: Optional[jnp.ndarray] = None,
                              eps: float = 1e-6) -> jnp.ndarray:
    """Pure-JAX reference (the math inside FastAttention after the norms,
    ``fast_attention.py:58-92``). q,k,v: [B, H, T, D]; projection: [D, m];
    mask: [B, 1, T] or None. float32 in, float32 out."""
    q_proj = jnp.exp(jnp.clip(jnp.einsum("bhtn,nm->bhtm", q, projection),
                              -15, 15)) * 0.1
    k_proj = jnp.exp(jnp.clip(jnp.einsum("bhtn,nm->bhtm", k, projection),
                              -15, 15)) * 0.1
    if mask is not None:
        k_proj = k_proj * mask[..., None]
    kv = jnp.einsum("bhtm,bhtn->bhmn", k_proj, v) * 0.1
    qkv = jnp.einsum("bhtm,bhmn->bhtn", q_proj, kv) * 0.1
    denominator = jnp.einsum("bhtm,bhtm->bht", q_proj, k_proj)[..., None]
    return qkv / jnp.maximum(denominator, eps)


def _favor_kernel(q_ref, k_ref, v_ref, proj_ref, mask_ref, out_ref, *,
                  eps: float):
    q = q_ref[0]        # [T, D]
    k = k_ref[0]
    v = v_ref[0]
    proj = proj_ref[:]  # [D, m]

    q_proj = jnp.exp(jnp.clip(
        jnp.dot(q, proj, preferred_element_type=jnp.float32), -15, 15)) * 0.1
    k_proj = jnp.exp(jnp.clip(
        jnp.dot(k, proj, preferred_element_type=jnp.float32), -15, 15)) * 0.1
    k_proj = k_proj * mask_ref[0]   # [T, 1] broadcast

    kv = jnp.dot(k_proj.T, v, preferred_element_type=jnp.float32) * 0.1
    qkv = jnp.dot(q_proj, kv, preferred_element_type=jnp.float32) * 0.1
    denominator = jnp.sum(q_proj * k_proj, axis=-1, keepdims=True)
    out_ref[0] = qkv / jnp.maximum(denominator, eps)


def _favor_pallas(q, k, v, projection, mask, eps: float):
    B, H, T, D = q.shape
    m = projection.shape[1]
    qf = q.reshape(B * H, T, D).astype(jnp.float32)
    kf = k.reshape(B * H, T, D).astype(jnp.float32)
    vf = v.reshape(B * H, T, D).astype(jnp.float32)
    if mask is None:
        maskf = jnp.ones((B, 1, T), jnp.float32)
    else:
        maskf = mask.astype(jnp.float32)
    # [B, 1, T] -> [B*H, T, 1]
    maskf = jnp.broadcast_to(maskf[:, None, 0, :], (B, H, T))
    maskf = maskf.reshape(B * H, T, 1)

    grid = (B * H,)
    out = pl.pallas_call(
        functools.partial(_favor_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, m), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (2 * T * D * m + T * m * D + m * T * D),
            bytes_accessed=4 * B * H * T * D * 4 + 4 * D * m,
            transcendentals=2 * B * H * T * m,
        ),
    )(qf, kf, vf, projection.astype(jnp.float32), maskf)
    return out.reshape(B, H, T, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def favor_attention(q, k, v, projection, mask=None, eps: float = 1e-6):
    """Fused FAVOR+ core. Same signature/semantics as
    :func:`favor_attention_reference`; forward runs the Pallas kernel when
    lowered for TPU (pure-JAX on other platforms — dispatched per lowering
    platform, so `with jax.default_device(cpu)` regions work), backward
    differentiates the reference."""
    return jax.lax.platform_dependent(
        q, k, v, projection, mask,
        tpu=lambda q_, k_, v_, p_, m_: _favor_pallas(q_, k_, v_, p_, m_, eps),
        default=lambda q_, k_, v_, p_, m_: favor_attention_reference(
            q_, k_, v_, p_, m_, eps),
    )


def _favor_fwd(q, k, v, projection, mask, eps):
    out = favor_attention(q, k, v, projection, mask, eps)
    return out, (q, k, v, projection, mask)


# ===========================================================================
# Fully-fused Performer core: LayerNorm + L2-norm + FAVOR+ + output norm
# ===========================================================================
#
# Profiling the flagship forward on v5e shows it is ~80% memory-bound:
# copies/reshapes (head transposes), dtype converts, and reduce fusions
# (LayerNorm / L2-norm passes) dwarf the actual matmuls. This kernel fuses
# the ENTIRE FastAttention module body (fast_attention.py:29-92):
#
#   shared-LayerNorm(q|k|v) -> L2-normalize(q,k) -> exp feature maps
#   -> kv/qkv contractions -> same-position denominator -> output LayerNorm
#
# into one VMEM-resident pass per (batch, head) grid cell, reading q/k/v
# STRAIGHT in [B, T, H*D] layout (the Dense output) — the per-head column
# slice happens in the BlockSpec index_map, eliminating the physical
# [B,T,H,D]->[B,H,T,D] transpose entirely.

LN_EPS = 1e-6  # flax.linen.LayerNorm default

# Negative results (measured end-to-end on v5e, 50-step DDIM bench):
# - A standalone one-pass Pallas LayerNorm swapped for the hot
#   nn.LayerNorms (XLA's convert_reduce lowering profiles ~4.5x off
#   roofline): 17.33 -> 17.19 all-sites, 17.11 DualBlock-only. The
#   pallas_call fusion barrier costs more than the one-pass saves.
# - Grouping G batch rows per favor_attention_qkv grid cell
#   (FAVOR_QKV_GROUP): G=2 15.2, G=4 14.9 vs G=1 16.0.
# - A fully head-VECTORIZED v3 of the merged-QKV kernel (per-head LN/L2/
#   denominator on [T, H, D] views, kv for all head pairs as one
#   [H*m, T] x [T, H*D] matmul masked block-diagonal, zero Python loops):
#   16.14 vs v2's 19.49. The [T, HD] <-> [T, H, D] view reductions force
#   Mosaic relayouts and the 4x-FLOP kv_full matmul is real MXU time; the
#   per-head loop over lane-tile slices (v2) is cheaper than both.


def favor_full_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         ln_scale: jnp.ndarray, ln_bias: jnp.ndarray,
                         projection: jnp.ndarray,
                         mask: Optional[jnp.ndarray],
                         eps: float = 1e-6,
                         pre_scale: float = 0.1) -> jnp.ndarray:
    """Pure-JAX reference for the fused op.

    q, k, v: [B, T, H*D] (raw Dense outputs); ln_scale/ln_bias: [D] shared
    LayerNorm params; projection: [D, m]; mask: [B, T] or None.
    Returns [B, T, H*D].
    """
    B, T, HD = q.shape
    D = projection.shape[0]
    H = HD // D

    def split(x):
        return x.reshape(B, T, H, D).astype(jnp.float32) * pre_scale

    def ln(x):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return ((x - mu) * jax.lax.rsqrt(var + LN_EPS)
                * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))

    qh, kh, vh = ln(split(q)), ln(split(k)), ln(split(v))
    qh = qh / jnp.maximum(jnp.linalg.norm(qh, axis=-1, keepdims=True), 1e-12)
    kh = kh / jnp.maximum(jnp.linalg.norm(kh, axis=-1, keepdims=True), 1e-12)

    proj32 = projection.astype(jnp.float32)
    q_proj = jnp.exp(jnp.clip(jnp.einsum("bthd,dm->bthm", qh, proj32),
                              -15, 15)) * 0.1
    k_proj = jnp.exp(jnp.clip(jnp.einsum("bthd,dm->bthm", kh, proj32),
                              -15, 15)) * 0.1
    if mask is not None:
        k_proj = k_proj * mask.astype(jnp.float32)[:, :, None, None]
    kv = jnp.einsum("bthm,bthd->bhmd", k_proj, vh) * 0.1
    qkv = jnp.einsum("bthm,bhmd->bthd", q_proj, kv) * 0.1
    den = jnp.maximum(jnp.sum(q_proj * k_proj, -1, keepdims=True), eps)
    out = ln(qkv / den)
    return out.reshape(B, T, HD).astype(q.dtype)


def _favor_full_kernel(q_ref, k_ref, v_ref, scale_ref, bias_ref, proj_ref,
                       mask_ref, out_ref, *, eps: float, pre_scale: float,
                       group: int):
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)

    def ln(x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias

    # row-wise ops run on the whole [G*T, D] group at once; only the
    # contractions are per-batch-row (static unrolled loop)
    G = group
    T = q_ref.shape[1]
    q = ln(q_ref[:].astype(jnp.float32).reshape(G * T, -1) * pre_scale)
    k = ln(k_ref[:].astype(jnp.float32).reshape(G * T, -1) * pre_scale)
    v = ln(v_ref[:].astype(jnp.float32).reshape(G * T, -1) * pre_scale)

    q = q * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(q * q, -1, keepdims=True), 1e-24))
    k = k * jax.lax.rsqrt(jnp.maximum(
        jnp.sum(k * k, -1, keepdims=True), 1e-24))

    proj = proj_ref[:].astype(jnp.float32)
    q_proj = jnp.exp(jnp.clip(
        jnp.dot(q, proj, preferred_element_type=jnp.float32), -15, 15)) * 0.1
    k_proj = jnp.exp(jnp.clip(
        jnp.dot(k, proj, preferred_element_type=jnp.float32), -15, 15)) * 0.1
    k_proj = k_proj * mask_ref[:].reshape(G * T, 1)

    den = jnp.maximum(jnp.sum(q_proj * k_proj, -1, keepdims=True), eps)
    m_feats = q_proj.shape[-1]
    q_proj = q_proj.reshape(G, T, m_feats)
    k_proj = k_proj.reshape(G, T, m_feats)
    v3 = v.reshape(G, T, -1)
    outs = []
    for g in range(G):
        kv = jnp.dot(k_proj[g].T, v3[g],
                     preferred_element_type=jnp.float32) * 0.1
        outs.append(jnp.dot(q_proj[g], kv,
                            preferred_element_type=jnp.float32) * 0.1)
    qkv = jnp.stack(outs, axis=0).reshape(G * T, -1)
    out = ln(qkv / den).astype(out_ref.dtype)
    out_ref[:] = out.reshape(G, T, -1)


def _favor_full_pallas(q, k, v, ln_scale, ln_bias, projection, mask,
                       eps: float, pre_scale: float):
    B, T, HD = q.shape
    D, m = projection.shape
    H = HD // D
    if mask is None:
        maskf = jnp.ones((B, T, 1), jnp.float32)
    else:
        maskf = mask.astype(jnp.float32).reshape(B, T, 1)

    # NOTE: grouping multiple batch rows per grid cell (G=8) was tried to
    # amortize per-cell overhead and LOST ~12% end-to-end (row-wise ops on
    # [G*T, D] tile worse and the per-g contractions serialize); per-(b,h)
    # cells win. Keep group=1.
    group = 1
    grid = (B // group, H)
    qkv_spec = pl.BlockSpec((group, T, D), lambda b, h: (b, 0, h),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_favor_full_kernel, eps=eps, pre_scale=pre_scale,
                          group=group),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        grid=grid,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, D), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, m), lambda b, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((group, T, 1), lambda b, h: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qkv_spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (2 * T * D * m + 2 * T * m * D),
            bytes_accessed=4 * B * T * HD * 4,
            transcendentals=2 * B * H * T * m,
        ),
    )(q, k, v, ln_scale.reshape(1, D), ln_bias.reshape(1, D), projection,
      maskf)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def favor_attention_full(q, k, v, ln_scale, ln_bias, projection, mask=None,
                         eps: float = 1e-6, pre_scale: float = 0.1):
    """Fully-fused Performer attention core (see module comment). Pallas on
    TPU, pure-JAX elsewhere; backward differentiates the reference."""
    return jax.lax.platform_dependent(
        q, k, v, ln_scale, ln_bias, projection, mask,
        tpu=lambda *a: _favor_full_pallas(*a, eps, pre_scale),
        default=lambda *a: favor_full_reference(*a, eps, pre_scale),
    )


def _favor_full_fwd(q, k, v, ln_scale, ln_bias, projection, mask, eps,
                    pre_scale):
    out = favor_attention_full(q, k, v, ln_scale, ln_bias, projection, mask,
                               eps, pre_scale)
    return out, (q, k, v, ln_scale, ln_bias, projection, mask)


def _favor_full_bwd(eps, pre_scale, residuals, g):
    q, k, v, ln_scale, ln_bias, projection, mask = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_, s_, b_, p_: favor_full_reference(
            q_, k_, v_, s_, b_, p_, mask, eps, pre_scale),
        q, k, v, ln_scale, ln_bias, projection)
    dq, dk, dv, ds, db, dp = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, ds, db, dp, dmask


favor_attention_full.defvjp(_favor_full_fwd, _favor_full_bwd)


# ===========================================================================
# Merged-QKV fused Performer core
# ===========================================================================
#
# One grid cell per BATCH ROW (not per (batch, head)): the kernel reads the
# single [T, 3*H*D] panel produced by the merged qkv Dense and processes all
# H heads with static column slices. vs the per-(b,h) favor_attention_full:
# 4x fewer grid cells, one contiguous DMA per cell instead of three strided
# ones, and the q/k/v Dense collapse into ONE [B*T, D]x[D, 3D] matmul
# upstream (better MXU shape, one LayerNorm consumer instead of three).
# Measured end-to-end on v5e: see bench history in the repo log.


def favor_qkv_reference(qkv: jnp.ndarray, ln_scale: jnp.ndarray,
                        ln_bias: jnp.ndarray, projection: jnp.ndarray,
                        mask: Optional[jnp.ndarray], eps: float = 1e-6,
                        pre_scale: float = 0.1) -> jnp.ndarray:
    """Pure-JAX reference. qkv: [B, T, 3*H*D] (merged Dense output,
    column order q|k|v); returns [B, T, H*D]."""
    HD = qkv.shape[-1] // 3
    q, k, v = qkv[..., :HD], qkv[..., HD:2 * HD], qkv[..., 2 * HD:]
    return favor_full_reference(q, k, v, ln_scale, ln_bias, projection,
                                mask, eps, pre_scale)


def _favor_qkv_kernel_v2(qkv_ref, scale_ref, bias_ref, projbd_ref, mask_ref,
                         out_ref, *, eps: float, pre_scale: float,
                         num_heads: int, mxu_bf16: bool = False):
    """Block-diagonal variant: per-head LayerNorm/L2 stay looped (cheap VPU
    work), but the feature-map matmuls run as ONE [T, H*D] x [H*D, H*m]
    block-diagonal product per q and k (projbd = kron(I_H, projection),
    built outside the kernel, hoisted by XLA as loop-invariant). 2 big
    MXU-shaped matmuls instead of 2*H small [T,D]x[D,m] ones, and the
    exp/clip feature map vectorizes across all heads.

    ``mxu_bf16`` (env ``FAVOR_MXU_BF16=1``): round MATMUL OPERANDS to
    bf16 (accumulation stays f32 via preferred_element_type) — a single
    MXU pass instead of the multi-pass f32 emulation. LayerNorm / L2 /
    exp / the denominator stay full f32 (SURVEY §7 hard part #5: the exp
    feature map is the precision-sensitive piece). Interpret-mode parity
    vs the f32 reference is asserted loose (~1e-2 rel) in
    tests/test_ops.py; an end-to-end drift test gates the serving knob."""

    def mx(x):
        return x.astype(jnp.bfloat16) if mxu_bf16 else x
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)

    def ln(x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias

    def l2(x):
        return x * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(x * x, -1, keepdims=True), 1e-24))

    T = qkv_ref.shape[1]
    H = num_heads
    HD = qkv_ref.shape[-1] // 3
    D = HD // H
    m = projbd_ref.shape[1] // H
    x = qkv_ref[0]                        # [T, 3*H*D]
    projbd = projbd_ref[:].astype(jnp.float32)
    m1 = mask_ref[0]                      # [T, 1] f32

    qs, ks, vs = [], [], []
    for h in range(H):
        c = h * D
        qs.append(l2(ln(x[:, c:c + D].astype(jnp.float32) * pre_scale)))
        ks.append(l2(ln(x[:, HD + c:HD + c + D].astype(jnp.float32)
                        * pre_scale)))
        vs.append(ln(x[:, 2 * HD + c:2 * HD + c + D].astype(jnp.float32)
                     * pre_scale))
    q = jnp.concatenate(qs, axis=-1)      # [T, H*D]
    k = jnp.concatenate(ks, axis=-1)

    q_proj = jnp.exp(jnp.clip(jnp.dot(
        mx(q), mx(projbd), preferred_element_type=jnp.float32),
        -15, 15)) * 0.1
    k_proj = jnp.exp(jnp.clip(jnp.dot(
        mx(k), mx(projbd), preferred_element_type=jnp.float32),
        -15, 15)) * 0.1
    k_proj = k_proj * m1                  # [T, H*m]

    for h in range(H):
        qp = q_proj[:, h * m:(h + 1) * m]
        kp = k_proj[:, h * m:(h + 1) * m]
        den = jnp.maximum(jnp.sum(qp * kp, -1, keepdims=True), eps)
        kv = jnp.dot(mx(kp).T, mx(vs[h]),
                     preferred_element_type=jnp.float32) * 0.1
        qkv_h = jnp.dot(mx(qp), mx(kv),
                        preferred_element_type=jnp.float32) * 0.1
        out_ref[0, :, h * D:(h + 1) * D] = (ln(qkv_h / den)
                                            .astype(out_ref.dtype))


def _favor_qkv_kernel(qkv_ref, scale_ref, bias_ref, proj_ref, mask_ref,
                      out_ref, *, eps: float, pre_scale: float,
                      num_heads: int, group: int):
    scale = scale_ref[0].astype(jnp.float32)
    bias = bias_ref[0].astype(jnp.float32)

    def ln(x):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * scale + bias

    def l2(x):
        return x * jax.lax.rsqrt(jnp.maximum(
            jnp.sum(x * x, -1, keepdims=True), 1e-24))

    G = group
    T = qkv_ref.shape[1]
    H = num_heads
    D = proj_ref.shape[0]
    HD = H * D
    x = qkv_ref[:]                       # [G, T, 3*H*D]
    proj = proj_ref[:].astype(jnp.float32)
    m1 = mask_ref[:].reshape(G * T, 1)   # [G*T, 1] f32

    for h in range(H):
        c = h * D
        # row-wise ops (LN/L2/feature maps) batch all G rows: [G*T, D]
        q = l2(ln(x[:, :, c:c + D].astype(jnp.float32)
                  .reshape(G * T, D) * pre_scale))
        k = l2(ln(x[:, :, HD + c:HD + c + D].astype(jnp.float32)
                  .reshape(G * T, D) * pre_scale))
        v = ln(x[:, :, 2 * HD + c:2 * HD + c + D].astype(jnp.float32)
               .reshape(G * T, D) * pre_scale)
        q_proj = jnp.exp(jnp.clip(jnp.dot(
            q, proj, preferred_element_type=jnp.float32), -15, 15)) * 0.1
        k_proj = jnp.exp(jnp.clip(jnp.dot(
            k, proj, preferred_element_type=jnp.float32), -15, 15)) * 0.1
        k_proj = k_proj * m1
        den = jnp.maximum(jnp.sum(q_proj * k_proj, -1, keepdims=True), eps)
        if G == 1:
            kv = jnp.dot(k_proj.T, v,
                         preferred_element_type=jnp.float32) * 0.1
            qkv_h = jnp.dot(q_proj, kv,
                            preferred_element_type=jnp.float32) * 0.1
            out_ref[0, :, c:c + D] = (ln(qkv_h / den)
                                      .astype(out_ref.dtype))
        else:
            mf = q_proj.shape[-1]
            qp3 = q_proj.reshape(G, T, mf)
            kp3 = k_proj.reshape(G, T, mf)
            v3 = v.reshape(G, T, D)
            den3 = den.reshape(G, T, 1)
            for g in range(G):
                kv = jnp.dot(kp3[g].T, v3[g],
                             preferred_element_type=jnp.float32) * 0.1
                qkv_h = jnp.dot(qp3[g], kv,
                                preferred_element_type=jnp.float32) * 0.1
                out_ref[g, :, c:c + D] = (ln(qkv_h / den3[g])
                                          .astype(out_ref.dtype))


def _favor_qkv_pallas(qkv, ln_scale, ln_bias, projection, mask, eps: float,
                      pre_scale: float):
    import os

    B, T, HD3 = qkv.shape
    HD = HD3 // 3
    D, m = projection.shape
    H = HD // D
    if mask is None:
        maskf = jnp.ones((B, T, 1), jnp.float32)
    else:
        maskf = mask.astype(jnp.float32).reshape(B, T, 1)

    if os.environ.get("FAVOR_QKV_V2", "1") != "0":
        # block-diagonal feature-map matmuls (see _favor_qkv_kernel_v2)
        projbd = jnp.kron(jnp.eye(H, dtype=projection.dtype), projection)
        return pl.pallas_call(
            functools.partial(
                _favor_qkv_kernel_v2, eps=eps, pre_scale=pre_scale,
                num_heads=H,
                mxu_bf16=os.environ.get("FAVOR_MXU_BF16", "0") == "1"),
            out_shape=jax.ShapeDtypeStruct((B, T, HD), qkv.dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, T, HD3), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((H * D, H * m), lambda b: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, T, 1), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * (2 * T * HD * H * m + 2 * H * T * m * D),
                bytes_accessed=B * T * (HD3 + HD) * qkv.dtype.itemsize,
                transcendentals=2 * B * H * T * m,
            ),
        )(qkv, ln_scale.reshape(1, D), ln_bias.reshape(1, D), projbd, maskf)

    group = int(os.environ.get("FAVOR_QKV_GROUP", "1"))
    if B % group != 0:
        group = 1

    out = pl.pallas_call(
        functools.partial(_favor_qkv_kernel, eps=eps, pre_scale=pre_scale,
                          num_heads=H, group=group),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), qkv.dtype),
        grid=(B // group,),
        in_specs=[
            pl.BlockSpec((group, T, HD3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, T, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, T, HD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (2 * T * D * m + 2 * T * m * D),
            bytes_accessed=B * T * (HD3 + HD) * qkv.dtype.itemsize,
            transcendentals=2 * B * H * T * m,
        ),
    )(qkv, ln_scale.reshape(1, D), ln_bias.reshape(1, D), projection, maskf)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def favor_attention_qkv(qkv, ln_scale, ln_bias, projection, mask=None,
                        eps: float = 1e-6, pre_scale: float = 0.1):
    """Merged-QKV fully-fused Performer core (see comment above). Pallas on
    TPU, pure-JAX elsewhere; backward differentiates the reference."""
    return jax.lax.platform_dependent(
        qkv, ln_scale, ln_bias, projection, mask,
        tpu=lambda *a: _favor_qkv_pallas(*a, eps, pre_scale),
        default=lambda *a: favor_qkv_reference(*a, eps, pre_scale),
    )


def _favor_qkv_fwd(qkv, ln_scale, ln_bias, projection, mask, eps, pre_scale):
    out = favor_attention_qkv(qkv, ln_scale, ln_bias, projection, mask,
                              eps, pre_scale)
    return out, (qkv, ln_scale, ln_bias, projection, mask)


def _favor_qkv_bwd_reference(qkv, ln_scale, ln_bias, projection, mask, g,
                             eps, pre_scale):
    _, vjp = jax.vjp(
        lambda x_, s_, b_, p_: favor_qkv_reference(
            x_, s_, b_, p_, mask, eps, pre_scale),
        qkv, ln_scale, ln_bias, projection)
    return vjp(g)


def _favor_qkv_bwd(eps, pre_scale, residuals, g):
    """Backward: hand-derived Pallas kernel on TPU (the train hot path —
    recomputing the unfused reference here put training at 14% MFU, see
    ops/performer_pallas_bwd.py), vjp-of-reference elsewhere."""
    from motiondiffusion_moe_tpu.ops.performer_pallas_bwd import (
        favor_qkv_bwd_pallas)

    qkv, ln_scale, ln_bias, projection, mask = residuals
    dx, ds, db, dp = jax.lax.platform_dependent(
        qkv, ln_scale, ln_bias, projection, mask, g,
        tpu=lambda x_, s_, b_, p_, m_, g_: favor_qkv_bwd_pallas(
            x_, s_, b_, p_, m_, g_, eps, pre_scale),
        default=lambda x_, s_, b_, p_, m_, g_: _favor_qkv_bwd_reference(
            x_, s_, b_, p_, m_, g_, eps, pre_scale),
    )
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dx, ds, db, dp, dmask


favor_attention_qkv.defvjp(_favor_qkv_fwd, _favor_qkv_bwd)


# ===========================================================================
# Fused Performer epilogue: post-LN -> L2*sqrt(D) -> style-LN -> modulate
# ===========================================================================
#
# After the Performer's proj_out MLP the block runs THREE consecutive
# normalization passes over [B, T, D] with only elementwise math between
# them (fast_attention.py:163-178 + stylization.py:26-28):
#
#   y -> LayerNorm(post) -> y/||y|| * sqrt(D) -> LayerNorm(style)
#     -> * (1+scale) + shift -> SiLU
#
# Each LN/L2 pass is individually at the HBM roofline (~25 MB read+write at
# the flagship shape), so 3 passes = 3x the traffic of the math's true
# working set. This kernel runs the whole chain VMEM-resident: one read,
# one write. The style matmul + residual stay outside (XLA fuses them).


def performer_epilogue_reference(y: jnp.ndarray, scale: jnp.ndarray,
                                 shift: jnp.ndarray,
                                 post_scale: jnp.ndarray,
                                 post_bias: jnp.ndarray,
                                 style_scale: jnp.ndarray,
                                 style_bias: jnp.ndarray) -> jnp.ndarray:
    """Pure-JAX reference. y: [B, T, D]; scale/shift: [B, D] (style
    modulation); *_scale/_bias: [D] LN params. Returns [B, T, D] in
    y.dtype."""
    D = y.shape[-1]
    yf = y.astype(jnp.float32)

    def ln(x, s, b):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return ((x - mu) * jax.lax.rsqrt(var + LN_EPS)
                * s.astype(jnp.float32) + b.astype(jnp.float32))

    h = ln(yf, post_scale, post_bias)
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
    h = h * (D ** 0.5)
    h = ln(h, style_scale, style_bias)
    h = h * (1 + scale[:, None, :].astype(jnp.float32)) \
        + shift[:, None, :].astype(jnp.float32)
    return (h * jax.nn.sigmoid(h)).astype(y.dtype)     # SiLU


def _epilogue_kernel(y_ref, scale_ref, shift_ref, ps_ref, pb_ref, ss_ref,
                     sb_ref, out_ref):
    D = y_ref.shape[-1]

    def ln(x, s, b):
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
        return (x - mu) * jax.lax.rsqrt(var + LN_EPS) * s + b

    y = y_ref[0].astype(jnp.float32)                     # [T, D]
    h = ln(y, ps_ref[0].astype(jnp.float32), pb_ref[0].astype(jnp.float32))
    h = h / jnp.maximum(
        jnp.sqrt(jnp.sum(h * h, -1, keepdims=True)), 1e-12)
    h = h * (D ** 0.5)
    h = ln(h, ss_ref[0].astype(jnp.float32), sb_ref[0].astype(jnp.float32))
    h = h * (1 + scale_ref[0, 0].astype(jnp.float32)) \
        + shift_ref[0, 0].astype(jnp.float32)
    out_ref[0] = (h * jax.nn.sigmoid(h)).astype(out_ref.dtype)


def _epilogue_pallas(y, scale, shift, post_scale, post_bias, style_scale,
                     style_bias):
    B, T, D = y.shape
    vec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _epilogue_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, D), y.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            vec, vec, vec, vec,
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * T * D,
            bytes_accessed=2 * B * T * D * y.dtype.itemsize,
            transcendentals=B * T * D,
        ),
    )(y, scale.reshape(B, 1, D), shift.reshape(B, 1, D),
      post_scale.reshape(1, D), post_bias.reshape(1, D),
      style_scale.reshape(1, D), style_bias.reshape(1, D))
    return out


@jax.custom_vjp
def performer_epilogue(y, scale, shift, post_scale, post_bias, style_scale,
                       style_bias):
    """Fused Performer epilogue chain (see comment above). Pallas on TPU,
    pure-JAX elsewhere; backward differentiates the reference."""
    return jax.lax.platform_dependent(
        y, scale, shift, post_scale, post_bias, style_scale, style_bias,
        tpu=_epilogue_pallas,
        default=performer_epilogue_reference,
    )


def _epilogue_fwd(*args):
    return performer_epilogue(*args), args


def _epilogue_bwd_reference(*args_and_g):
    *args, g = args_and_g
    _, vjp = jax.vjp(performer_epilogue_reference, *args)
    return vjp(g)


def _epilogue_bwd(residuals, g):
    """Backward: hand-derived Pallas kernel on TPU (one VMEM pass instead
    of ~6 HBM-roofline normalization-chain fusions), vjp-of-reference
    elsewhere."""
    from motiondiffusion_moe_tpu.ops.performer_pallas_bwd import (
        epilogue_bwd_pallas)

    return jax.lax.platform_dependent(
        *residuals, g,
        tpu=epilogue_bwd_pallas,
        default=_epilogue_bwd_reference,
    )


performer_epilogue.defvjp(_epilogue_fwd, _epilogue_bwd)


def _favor_bwd(eps, residuals, g):
    q, k, v, projection, mask = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_, p_: favor_attention_reference(q_, k_, v_, p_,
                                                         mask, eps),
        q, k, v, projection)
    dq, dk, dv, dp = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dp, dmask


favor_attention.defvjp(_favor_fwd, _favor_bwd)
