"""Hand-derived Pallas BACKWARD kernels for the fused Performer ops.

Round-2 profiling showed training at 14% MFU because every custom VJP
recomputed the pure-JAX unfused reference for its backward: 48.7% of train
device time was generic elementwise fusions and 10.5% gradient reductions,
while the forward Pallas kernels covered 2.6% (BENCH_NOTES.md). These
kernels compute the full backward of

- :func:`..performer_pallas.favor_attention_qkv` (merged-QKV fused
  Performer core: shared LayerNorm -> L2 -> exp feature maps -> kv/qkv
  contractions -> same-position denominator -> output LayerNorm), and
- :func:`..performer_pallas.performer_epilogue` (post-LN -> L2*sqrt(D) ->
  style-LN -> modulate -> SiLU),

entirely VMEM-resident per grid cell: the forward intermediates are
recomputed in-kernel (cheap — they never leave VMEM) and the gradient
chains are hand-derived, so the backward is a handful of MXU matmuls plus
vector math instead of ~30 HBM-roofline XLA fusions.

Gradient conventions match the jax.vjp of the reference implementations
(verified by the grad-parity tests in tests/test_ops_bwd.py):

- LayerNorm: dx = istd * (s*g - mean(s*g) - z * mean(s*g*z)),
  ds = sum(g*z), dc = sum(g)  (z = (x-mu)*istd)
- L2 normalize x/max(sqrt(sum x^2), cutoff): product/chain rule with the
  max() subgradient (grad flows iff the norm exceeds the cutoff)
- clip(x, -15, 15): pass iff -15 <= x <= 15
- max(den, eps): pass iff den >= eps

Shared LN scale/bias and projection gradients are accumulated ACROSS grid
cells into revisited output blocks (TPU grid iterations execute
sequentially, so read-modify-write on a shared output block is safe).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6


def _ln_fwd(x, s, c):
    """Returns (y, z, istd)."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mu) ** 2, axis=-1, keepdims=True)
    istd = jax.lax.rsqrt(var + LN_EPS)
    z = (x - mu) * istd
    return z * s + c, z, istd


def _ln_bwd(g, z, istd, s):
    """Returns (dx, ds_partial, dc_partial)."""
    sg = g * s
    dx = istd * (sg - jnp.mean(sg, -1, keepdims=True)
                 - z * jnp.mean(sg * z, -1, keepdims=True))
    return dx, jnp.sum(g * z, axis=0), jnp.sum(g, axis=0)


# ===========================================================================
# favor_attention_qkv backward
# ===========================================================================


def _favor_qkv_bwd_kernel(qkv_ref, scale_ref, bias_ref, proj_ref, mask_ref,
                          g_ref, dx_ref, ds_ref, dc_ref, dp_ref, *,
                          eps: float, pre_scale: float, num_heads: int,
                          mxu_bf16: bool = False):
    b = pl.program_id(0)

    def mx(x):
        # FAVOR_MXU_BF16 (same knob as the forward kernel): matmul
        # operands rounded to bf16, f32 accumulation. The LN/L2/exp
        # chains and all gradient accumulators stay f32.
        return x.astype(jnp.bfloat16) if mxu_bf16 else x

    @pl.when(b == 0)
    def _init():
        ds_ref[:] = jnp.zeros_like(ds_ref)
        dc_ref[:] = jnp.zeros_like(dc_ref)
        dp_ref[:] = jnp.zeros_like(dp_ref)

    s = scale_ref[0].astype(jnp.float32)
    c = bias_ref[0].astype(jnp.float32)
    proj = proj_ref[:].astype(jnp.float32)       # [D, m]
    H = num_heads
    D = proj.shape[0]
    HD = H * D
    x = qkv_ref[0]                               # [T, 3*H*D]
    g_all = g_ref[0]                             # [T, H*D]
    mask = mask_ref[0]                           # [T, 1] f32

    ds_acc = jnp.zeros((D,), jnp.float32)
    dc_acc = jnp.zeros((D,), jnp.float32)
    dp_acc = jnp.zeros_like(proj)

    def l2_fwd(v):
        n2 = jnp.sum(v * v, -1, keepdims=True)
        r = jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
        return v * r, r, n2

    for h in range(H):
        col = h * D
        # ---- forward recompute (VMEM-resident) ----
        q0 = x[:, col:col + D].astype(jnp.float32) * pre_scale
        k0 = x[:, HD + col:HD + col + D].astype(jnp.float32) * pre_scale
        v0 = x[:, 2 * HD + col:2 * HD + col + D].astype(jnp.float32) \
            * pre_scale
        q1, zq, iq = _ln_fwd(q0, s, c)
        k1, zk, ik = _ln_fwd(k0, s, c)
        v1, zv, iv = _ln_fwd(v0, s, c)
        q2, rq, nq2 = l2_fwd(q1)
        k2, rk, nk2 = l2_fwd(k1)

        qlin = jnp.dot(mx(q2), mx(proj), preferred_element_type=jnp.float32)
        klin = jnp.dot(mx(k2), mx(proj), preferred_element_type=jnp.float32)
        qp = jnp.exp(jnp.clip(qlin, -15, 15)) * 0.1          # [T, m]
        kp_u = jnp.exp(jnp.clip(klin, -15, 15)) * 0.1
        kp = kp_u * mask
        den_raw = jnp.sum(qp * kp, -1, keepdims=True)
        den = jnp.maximum(den_raw, eps)
        kv = jnp.dot(mx(kp).T, mx(v1),
                     preferred_element_type=jnp.float32) * 0.1
        o = jnp.dot(mx(qp), mx(kv), preferred_element_type=jnp.float32) * 0.1
        u = o / den
        _, zo, io = _ln_fwd(u, s, c)

        # ---- backward ----
        g = g_all[:, col:col + D].astype(jnp.float32)
        g_u, ds_h, dc_h = _ln_bwd(g, zo, io, s)
        ds_acc += ds_h
        dc_acc += dc_h

        g_o = g_u / den
        g_den = -jnp.sum(g_u * u, -1, keepdims=True) / den
        g_den = jnp.where(den_raw >= eps, g_den, 0.0)

        g_qp = jnp.dot(mx(g_o), mx(kv).T,
                       preferred_element_type=jnp.float32) * 0.1 \
            + g_den * kp
        g_kv = jnp.dot(mx(qp).T, mx(g_o),
                       preferred_element_type=jnp.float32) * 0.1
        g_kp = jnp.dot(mx(v1), mx(g_kv).T,
                       preferred_element_type=jnp.float32) * 0.1 \
            + g_den * qp
        g_v1 = jnp.dot(mx(kp), mx(g_kv),
                       preferred_element_type=jnp.float32) * 0.1

        pass_q = (qlin >= -15) & (qlin <= 15)
        pass_k = (klin >= -15) & (klin <= 15)
        dqlin = jnp.where(pass_q, g_qp * qp, 0.0)
        dklin = jnp.where(pass_k, g_kp * mask * kp_u, 0.0)

        g_q2 = jnp.dot(mx(dqlin), mx(proj).T,
                       preferred_element_type=jnp.float32)
        g_k2 = jnp.dot(mx(dklin), mx(proj).T,
                       preferred_element_type=jnp.float32)
        dp_acc += jnp.dot(mx(q2).T, mx(dqlin),
                          preferred_element_type=jnp.float32)
        dp_acc += jnp.dot(mx(k2).T, mx(dklin),
                          preferred_element_type=jnp.float32)

        # L2 backward (max(norm^2, 1e-24) cutoff in rsqrt form)
        def l2_bwd(gy, v, r, n2):
            t = jnp.sum(gy * v, -1, keepdims=True)
            live = (n2 >= 1e-24).astype(jnp.float32)
            return gy * r - v * (r * r * r) * t * live

        g_q1 = l2_bwd(g_q2, q1, rq, nq2)
        g_k1 = l2_bwd(g_k2, k1, rk, nk2)

        g_q0, ds_h, dc_h = _ln_bwd(g_q1, zq, iq, s)
        ds_acc += ds_h
        dc_acc += dc_h
        g_k0, ds_h, dc_h = _ln_bwd(g_k1, zk, ik, s)
        ds_acc += ds_h
        dc_acc += dc_h
        g_v0, ds_h, dc_h = _ln_bwd(g_v1, zv, iv, s)
        ds_acc += ds_h
        dc_acc += dc_h

        dx_ref[0, :, col:col + D] = (g_q0 * pre_scale).astype(dx_ref.dtype)
        dx_ref[0, :, HD + col:HD + col + D] = (g_k0 * pre_scale).astype(
            dx_ref.dtype)
        dx_ref[0, :, 2 * HD + col:2 * HD + col + D] = (
            g_v0 * pre_scale).astype(dx_ref.dtype)

    ds_ref[:] += ds_acc.reshape(1, D)
    dc_ref[:] += dc_acc.reshape(1, D)
    dp_ref[:] += dp_acc


def favor_qkv_bwd_pallas(qkv, ln_scale, ln_bias, projection, mask, g,
                         eps: float = 1e-6, pre_scale: float = 0.1,
                         interpret: bool = False):
    """Full backward of favor_attention_qkv as one Pallas kernel.

    Returns (dqkv, d_ln_scale, d_ln_bias, d_projection). The mask gets no
    gradient (binary frame-validity mask).
    """
    B, T, HD3 = qkv.shape
    HD = HD3 // 3
    D, m = projection.shape
    H = HD // D
    if mask is None:
        maskf = jnp.ones((B, T, 1), jnp.float32)
    else:
        maskf = mask.astype(jnp.float32).reshape(B, T, 1)

    import os
    # FAVOR_MXU_BF16 only takes effect when the FORWARD applied it too
    # (the v2 kernel path — performer_pallas.py:504-511): the backward
    # recomputes the forward intermediates, and rounding them differently
    # from the loss actually computed would make the clip pass-through
    # masks (|logit| near 15) and every downstream VJP term inconsistent.
    mxu_bf16 = (os.environ.get("FAVOR_MXU_BF16", "0") == "1"
                and os.environ.get("FAVOR_QKV_V2", "1") != "0")
    dx, ds, dc, dp = pl.pallas_call(
        functools.partial(
            _favor_qkv_bwd_kernel, eps=eps, pre_scale=pre_scale,
            num_heads=H, mxu_bf16=mxu_bf16),
        out_shape=(
            jax.ShapeDtypeStruct((B, T, HD3), qkv.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, m), jnp.float32),
        ),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, HD3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 1), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, T, HD3), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # shared accumulators: every grid cell revisits block (0, 0);
            # TPU grid execution is sequential, so += is well-defined
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, m), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * (12 * T * D * m + 2 * T * m * D),
            bytes_accessed=2 * B * T * (HD3 + HD) * qkv.dtype.itemsize,
            transcendentals=2 * B * H * T * m,
        ),
        interpret=interpret,
    )(qkv, ln_scale.reshape(1, D), ln_bias.reshape(1, D),
      projection, maskf, g)
    return (dx, ds.reshape(ln_scale.shape).astype(ln_scale.dtype),
            dc.reshape(ln_bias.shape).astype(ln_bias.dtype),
            dp.astype(projection.dtype))


# ===========================================================================
# performer_epilogue backward
# ===========================================================================


def _epilogue_bwd_kernel(y_ref, scale_ref, shift_ref, ps_ref, pb_ref,
                         ss_ref, sb_ref, g_ref,
                         dy_ref, dscale_ref, dshift_ref,
                         dps_ref, dpb_ref, dss_ref, dsb_ref):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        dps_ref[:] = jnp.zeros_like(dps_ref)
        dpb_ref[:] = jnp.zeros_like(dpb_ref)
        dss_ref[:] = jnp.zeros_like(dss_ref)
        dsb_ref[:] = jnp.zeros_like(dsb_ref)

    D = y_ref.shape[-1]
    ps = ps_ref[0].astype(jnp.float32)
    pb = pb_ref[0].astype(jnp.float32)
    ss = ss_ref[0].astype(jnp.float32)
    sb = sb_ref[0].astype(jnp.float32)
    sc = scale_ref[0, 0].astype(jnp.float32)     # [D] per-batch modulation
    sh = shift_ref[0, 0].astype(jnp.float32)

    # ---- forward recompute ----
    yf = y_ref[0].astype(jnp.float32)            # [T, D]
    h1, z1, i1 = _ln_fwd(yf, ps, pb)
    n = jnp.sqrt(jnp.sum(h1 * h1, -1, keepdims=True))
    mx = jnp.maximum(n, 1e-12)
    h2 = h1 / mx * (D ** 0.5)
    h3, z3, i3 = _ln_fwd(h2, ss, sb)
    h4 = h3 * (1 + sc) + sh
    sig = jax.nn.sigmoid(h4)

    # ---- backward ----
    g = g_ref[0].astype(jnp.float32)
    dh4 = g * sig * (1 + h4 * (1 - sig))         # SiLU'
    dscale_ref[0, 0] = jnp.sum(dh4 * h3, axis=0).astype(dscale_ref.dtype)
    dshift_ref[0, 0] = jnp.sum(dh4, axis=0).astype(dshift_ref.dtype)
    dh3 = dh4 * (1 + sc)
    dh2, dss_h, dsb_h = _ln_bwd(dh3, z3, i3, ss)

    # h2 = h1 * sqrt(D) / max(||h1||, 1e-12)
    t = jnp.sum(dh2 * h1, -1, keepdims=True)
    inv_n = jnp.where(n > 0, 1.0 / n, 0.0)
    live = (n >= 1e-12).astype(jnp.float32)
    dh1 = dh2 * (D ** 0.5) / mx \
        - h1 * ((D ** 0.5) * t / (mx * mx)) * live * inv_n

    dyf, dps_h, dpb_h = _ln_bwd(dh1, z1, i1, ps)
    dy_ref[0] = dyf.astype(dy_ref.dtype)

    dps_ref[:] += dps_h.reshape(1, D)
    dpb_ref[:] += dpb_h.reshape(1, D)
    dss_ref[:] += dss_h.reshape(1, D)
    dsb_ref[:] += dsb_h.reshape(1, D)


def epilogue_bwd_pallas(y, scale, shift, post_scale, post_bias, style_scale,
                        style_bias, g, interpret: bool = False):
    """Full backward of performer_epilogue as one Pallas kernel.

    Returns (dy, dscale, dshift, d_post_scale, d_post_bias, d_style_scale,
    d_style_bias).
    """
    B, T, D = y.shape
    vec = pl.BlockSpec((1, D), lambda b: (0, 0), memory_space=pltpu.VMEM)
    mod = pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                       memory_space=pltpu.VMEM)
    panel = pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _epilogue_bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((B, T, D), y.dtype),
            jax.ShapeDtypeStruct((B, 1, D), scale.dtype),
            jax.ShapeDtypeStruct((B, 1, D), shift.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ),
        grid=(B,),
        in_specs=[panel, mod, mod, vec, vec, vec, vec, panel],
        out_specs=(panel, mod, mod, vec, vec, vec, vec),
        cost_estimate=pl.CostEstimate(
            flops=40 * B * T * D,
            bytes_accessed=4 * B * T * D * y.dtype.itemsize,
            transcendentals=2 * B * T * D,
        ),
        interpret=interpret,
    )(y, scale.reshape(B, 1, D), shift.reshape(B, 1, D),
      post_scale.reshape(1, D), post_bias.reshape(1, D),
      style_scale.reshape(1, D), style_bias.reshape(1, D), g)
    dy, dsc, dsh, dps, dpb, dss, dsb = outs
    return (dy, dsc.reshape(scale.shape), dsh.reshape(shift.shape),
            dps.reshape(post_scale.shape).astype(post_scale.dtype),
            dpb.reshape(post_bias.shape).astype(post_bias.dtype),
            dss.reshape(style_scale.shape).astype(style_scale.dtype),
            dsb.reshape(style_bias.shape).astype(style_bias.dtype))
