"""Fused AdaLN epilogue: LayerNorm + (1+scale)/shift modulation + SiLU +
output projection in one Pallas kernel.

The StylizationBlock body (``stylization.py:26-31``) appears 4x per decoder
layer x 16 layers = 64 instances per forward; its elementwise prologue
(LN read/write, modulation, SiLU) is pure HBM traffic around a [N, D] x
[D, D] matmul. This kernel runs the prologue on the VMEM-resident tile feeding
the MXU — zero intermediate HBM round trips.

Used in DETERMINISTIC mode only (the sampling hot path): the reference
applies dropout between SiLU and the projection (``stylization.py:16-19``),
which needs per-call rng; training falls back to the unfused module path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6


def adaln_dense_reference(h: jnp.ndarray, scale: jnp.ndarray,
                          shift: jnp.ndarray, ln_scale: jnp.ndarray,
                          ln_bias: jnp.ndarray, w: jnp.ndarray,
                          b: jnp.ndarray) -> jnp.ndarray:
    """Pure-JAX reference. h: [B, T, D]; scale/shift: [B, D];
    ln_scale/ln_bias: [D]; w: [D, Dout]; b: [Dout]."""
    hf = h.astype(jnp.float32)
    mu = hf.mean(-1, keepdims=True)
    var = ((hf - mu) ** 2).mean(-1, keepdims=True)
    normed = ((hf - mu) * jax.lax.rsqrt(var + LN_EPS)
              * ln_scale.astype(jnp.float32) + ln_bias.astype(jnp.float32))
    mod = normed * (1 + scale.astype(jnp.float32)[:, None, :]) \
        + shift.astype(jnp.float32)[:, None, :]
    act = mod * jax.nn.sigmoid(mod)  # silu
    out = jnp.einsum("btd,de->bte", act.astype(h.dtype), w) + b
    return out.astype(h.dtype)


def _adaln_kernel(h_ref, scale_ref, shift_ref, lns_ref, lnb_ref, w_ref,
                  b_ref, out_ref):
    h = h_ref[0].astype(jnp.float32)           # [T, D]
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean((h - mu) ** 2, axis=-1, keepdims=True)
    normed = ((h - mu) * jax.lax.rsqrt(var + LN_EPS)
              * lns_ref[0].astype(jnp.float32)
              + lnb_ref[0].astype(jnp.float32))
    mod = normed * (1 + scale_ref[0].astype(jnp.float32)) \
        + shift_ref[0].astype(jnp.float32)
    act = mod * jax.nn.sigmoid(mod)
    out = jnp.dot(act.astype(w_ref.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)
    out_ref[0] = (out + b_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def _adaln_pallas(h, scale, shift, ln_scale, ln_bias, w, b):
    B, T, D = h.shape
    Dout = w.shape[1]
    out = pl.pallas_call(
        _adaln_kernel,
        out_shape=jax.ShapeDtypeStruct((B, T, Dout), h.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, Dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Dout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, Dout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T * D * Dout,
            bytes_accessed=2 * (B * T * D + B * T * Dout) + 4 * D * Dout,
            transcendentals=B * T * D,
        ),
    )(h, scale.reshape(B, 1, D), shift.reshape(B, 1, D),
      ln_scale.reshape(1, D), ln_bias.reshape(1, D), w, b.reshape(1, Dout))
    return out


@jax.custom_vjp
def adaln_dense(h, scale, shift, ln_scale, ln_bias, w, b):
    """Fused LN+modulate+SiLU+Dense (see module docstring)."""
    return jax.lax.platform_dependent(
        h, scale, shift, ln_scale, ln_bias, w, b,
        tpu=_adaln_pallas,
        default=adaln_dense_reference,
    )


def _adaln_fwd(h, scale, shift, ln_scale, ln_bias, w, b):
    out = adaln_dense(h, scale, shift, ln_scale, ln_bias, w, b)
    return out, (h, scale, shift, ln_scale, ln_bias, w, b)


def _adaln_bwd(residuals, g):
    return jax.vjp(adaln_dense_reference, *residuals)[1](g)


adaln_dense.defvjp(_adaln_fwd, _adaln_bwd)
