"""Blockwise (flash-style) exact cross-attention as a Pallas TPU kernel.

The TPU-native replacement for the reference's chunked
``MemoryEfficientCrossAttentionBlock`` loop
(``text2motion/models/fast_attention.py:274-330``): instead of Python
query-chunking, queries are tiled by the Pallas grid and keys/values are
consumed in VMEM blocks with an online (running max / running sum) softmax —
no [T, N] score matrix ever materializes in HBM. Exact softmax semantics;
bit-comparable to the whole-sequence computation up to f32 reduction order.

Training backward differentiates the pure-JAX reference (one recompute),
like :mod:`performer_pallas`.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cross_attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                              bias: Optional[jnp.ndarray] = None,
                              scale: Optional[float] = None) -> jnp.ndarray:
    """Pure-JAX exact cross-attention. q: [B, H, T, D]; k, v: [B, H, N, D];
    bias: additive [B, 1|H, T, N] or None."""
    D = q.shape[-1]
    scale = scale if scale is not None else D ** -0.5
    scores = jnp.einsum("bhtd,bhnd->bhtn", q * scale, k)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    return jnp.einsum("bhtn,bhnd->bhtd", probs.astype(q.dtype), v)


def _flash_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                  block_n: int, n_total: int):
    q = q_ref[0].astype(jnp.float32) * scale          # [bq, D]
    bq, D = q.shape
    num_blocks = pl.cdiv(n_total, block_n)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        kb = k_ref[0, pl.ds(i * block_n, block_n)].astype(jnp.float32)
        vb = v_ref[0, pl.ds(i * block_n, block_n)].astype(jnp.float32)
        s = jnp.dot(q, kb.T, preferred_element_type=jnp.float32)  # [bq, bn]
        # mask out-of-range keys in the tail block
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + i * block_n
        s = jnp.where(col < n_total, s, -jnp.inf)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, vb,
                                    preferred_element_type=jnp.float32)
        return m_new, l_new, acc

    m0 = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, D), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_blocks, body, (m0, l0, acc0))
    out_ref[0] = acc / jnp.maximum(l, 1e-20)


def _flash_pallas(q, k, v, scale: float, block_q: int, block_n: int):
    B, H, T, D = q.shape
    N = k.shape[2]
    qf = q.reshape(B * H, T, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, D)

    num_q_blocks = pl.cdiv(T, block_q)
    grid = (B * H, num_q_blocks)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_n=block_n,
                          n_total=N),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, D), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * N * D,
            bytes_accessed=4 * (2 * B * H * T * D + 2 * B * H * N * D),
            transcendentals=B * H * T * N,
        ),
    )(qf, kf, vf)
    return out.reshape(B, H, T, D).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_cross_attention(q, k, v, scale: Optional[float] = None,
                          block_q: int = 128, block_n: int = 128):
    """Exact cross-attention, flash-tiled on TPU (unbiased/unmasked path —
    padded text keys are handled upstream exactly as the reference leaves
    them unmasked, ``fast_attention.py:301-330``)."""
    D = q.shape[-1]
    s = scale if scale is not None else D ** -0.5
    return jax.lax.platform_dependent(
        q, k, v,
        tpu=lambda q_, k_, v_: _flash_pallas(q_, k_, v_, s, block_q, block_n),
        default=lambda q_, k_, v_: cross_attention_reference(q_, k_, v_,
                                                             None, s),
    )


def _flash_fwd(q, k, v, scale, block_q, block_n):
    return flash_cross_attention(q, k, v, scale, block_q, block_n), (q, k, v)


def _flash_bwd(scale, block_q, block_n, residuals, g):
    q, k, v = residuals
    D = q.shape[-1]
    s = scale if scale is not None else D ** -0.5
    _, vjp = jax.vjp(
        lambda q_, k_, v_: cross_attention_reference(q_, k_, v_, None, s),
        q, k, v)
    return vjp(g)


flash_cross_attention.defvjp(_flash_fwd, _flash_bwd)


# ===========================================================================
# Fast-layout exact cross-attention (text conditioning at N ~ 77 keys)
# ===========================================================================
#
# The module-path einsums ("bqhd,bkhd->bhqk" -> f32 softmax -> "bhqk,bkhd")
# materialize the [B, H, T, N] score/prob tensors in HBM twice and force
# physical head transposes of q/k/v. At the flagship shape that is pure
# HBM-roofline traffic around ~1 GF of matmul. This kernel reads q/k/v
# STRAIGHT in the Dense output layout ([B, T, H*D] / [B, N, H*D]), one grid
# cell per batch row, heads as static column slices; scores, softmax and
# the probs @ v contraction stay VMEM-resident.
#
# No key mask, matching the reference quirk: padded text keys attend
# unmasked (fast_attention.py:301-330 passes no mask).


def xattn_fastlayout_reference(q: jnp.ndarray, k: jnp.ndarray,
                               v: jnp.ndarray, num_heads: int,
                               scale: Optional[float] = None) -> jnp.ndarray:
    """Pure-JAX reference. q: [B, T, H*D]; k, v: [B, N, H*D]."""
    B, T, HD = q.shape
    N = k.shape[1]
    D = HD // num_heads
    s = scale if scale is not None else D ** -0.5
    qh = q.reshape(B, T, num_heads, D)
    kh = k.reshape(B, N, num_heads, D)
    vh = v.reshape(B, N, num_heads, D)
    scores = jnp.einsum("bthd,bnhd->bhtn", qh.astype(jnp.float32) * s,
                        kh.astype(jnp.float32))
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhtn,bnhd->bthd", probs, vh.astype(jnp.float32))
    return out.reshape(B, T, HD).astype(q.dtype)


def _xattn_fast_kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float,
                       num_heads: int):
    H = num_heads
    HD = q_ref.shape[-1]
    D = HD // H
    for h in range(H):
        c = h * D
        qh = q_ref[0, :, c:c + D].astype(jnp.float32) * scale   # [T, D]
        kh = k_ref[0, :, c:c + D].astype(jnp.float32)           # [N, D]
        vh = v_ref[0, :, c:c + D].astype(jnp.float32)
        s = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)  # [T, N]
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.dot(p, vh, preferred_element_type=jnp.float32)
        out_ref[0, :, c:c + D] = out.astype(out_ref.dtype)


def _xattn_fast_pallas(q, k, v, num_heads: int, scale: float):
    B, T, HD = q.shape
    N = k.shape[1]
    out = pl.pallas_call(
        functools.partial(_xattn_fast_kernel, scale=scale,
                          num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), q.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, HD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * T * N * HD,
            bytes_accessed=(2 * B * T * HD + 2 * B * N * HD)
            * q.dtype.itemsize,
            transcendentals=B * num_heads * T * N,
        ),
    )(q, k, v)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def xattn_fastlayout(q, k, v, num_heads: int,
                     scale: Optional[float] = None):
    """Fast-layout exact cross-attention (see comment above). Pallas on
    TPU, pure-JAX elsewhere; backward differentiates the reference."""
    D = q.shape[-1] // num_heads
    s = scale if scale is not None else D ** -0.5
    return jax.lax.platform_dependent(
        q, k, v,
        tpu=lambda q_, k_, v_: _xattn_fast_pallas(q_, k_, v_, num_heads, s),
        default=lambda q_, k_, v_: xattn_fastlayout_reference(
            q_, k_, v_, num_heads, s),
    )


def _xattn_fast_fwd(q, k, v, num_heads, scale):
    return xattn_fastlayout(q, k, v, num_heads, scale), (q, k, v)


def _xattn_fast_bwd(num_heads, scale, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(
        lambda q_, k_, v_: xattn_fastlayout_reference(q_, k_, v_, num_heads,
                                                      scale), q, k, v)
    return vjp(g)


xattn_fastlayout.defvjp(_xattn_fast_fwd, _xattn_fast_bwd)
