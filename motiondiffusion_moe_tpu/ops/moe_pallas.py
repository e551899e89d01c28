"""Fused MoE dense_fused expert compute as one Pallas kernel.

The flagship sampler's profile (BENCH_NOTES.md round-3 table) shows the
MoE ``dense_fused`` chain — ``x @ w1m -> +b1 -> gelu -> *combine ->
@ w2 (+ combine @ b2)`` — split by XLA into convolution + two large
output fusions running at ~50% of the MXU rate, with a float32
layer-norm-input materialization in the middle: ~3.2 ms of the 15.9 ms
device step at B=32. This kernel runs the whole chain VMEM-resident per
token tile: both matmuls hit the MXU back to back, the gelu/combine
weighting happens on the f32 accumulator without an HBM round trip, and
only the final [S, D] result is written back.

Routing stays in XLA (models/moe.py computes gate logits, softmax,
top-k, the combine weights, and the usage/importance metrics exactly as
before — they are cheap [S, E] ops); the kernel receives the finished
``combine`` tensor. That keeps the kernel free of sort/tie-break logic
and keeps the sown metrics bit-identical.

Capability match of the expert compute in
``text2motion/models/switch_moe.py:97-109`` (the reference's per-expert
Python loop), in the stacked-matmul form derived in
``models/moe.py:129-147``.

Backward: ``jax.vjp`` of the pure-JAX reference below (the kernel is
deterministic-region only; training throughput is already carried by
the scanned-step path, see BENCH_NOTES.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["moe_dense_fused", "moe_dense_fused_reference"]


def moe_dense_fused_reference(x, combine, w1m, b1r, w2m, b2):
    """Pure-JAX reference with the kernel's exact math.

    x: [S, D] (bf16 or f32)       combine: [S, E] (same dtype)
    w1m: [D, E*hid]  b1r: [1, E*hid]  w2m: [E*hid, D]  b2: [E, D]

    Differences from the historical inline module math (models/moe.py):
    the hidden chain (bias add, gelu, combine weighting) runs in f32 on
    the matmul accumulator instead of round-tripping through the model
    dtype — same algebra, one fewer rounding step.
    """
    E = b2.shape[0]
    hid = w1m.shape[1] // E
    h = jnp.dot(x, w1m, preferred_element_type=jnp.float32)
    h = h + b1r.astype(jnp.float32)
    h = jax.nn.gelu(h)
    cr = jnp.repeat(combine.astype(jnp.float32), hid, axis=1)
    h = (h * cr).astype(x.dtype)
    out = jnp.dot(h, w2m, preferred_element_type=jnp.float32)
    out = out + jnp.dot(combine, b2, preferred_element_type=jnp.float32)
    return out.astype(x.dtype)


def _moe_kernel(x_ref, c_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                num_experts: int):
    E = num_experts
    hid = w1_ref.shape[1] // E
    x = x_ref[:]
    # both matmuls in the model compute dtype (bf16 on the flagship:
    # full MXU rate), f32 accumulation; hidden chain on the f32
    # accumulator, VMEM-resident
    h = jnp.dot(x, w1_ref[:], preferred_element_type=jnp.float32)
    h = h + b1_ref[:].astype(jnp.float32)
    h = jax.nn.gelu(h)
    c = c_ref[:].astype(jnp.float32)            # [TS, E]
    parts = []
    for e in range(E):                           # static unroll; 128-aligned
        parts.append(h[:, e * hid:(e + 1) * hid] * c[:, e:e + 1])
    hw = jnp.concatenate(parts, axis=-1).astype(x.dtype)
    out = jnp.dot(hw, w2_ref[:], preferred_element_type=jnp.float32)
    out = out + jnp.dot(c_ref[:], b2_ref[:],
                        preferred_element_type=jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


def _moe_pallas(x, combine, w1m, b1r, w2m, b2, interpret: bool = False):
    S, D = x.shape
    E = b2.shape[0]
    EH = w1m.shape[1]
    TS = min(S, 512)
    grid = (pl.cdiv(S, TS),)
    return pl.pallas_call(
        functools.partial(_moe_kernel, num_experts=E),
        out_shape=jax.ShapeDtypeStruct((S, D), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TS, D), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TS, E), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, EH), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, EH), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((EH, D), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E, D), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TS, D), lambda s: (s, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * S * D * EH * 2,
            bytes_accessed=(S * (2 * D + E) + 2 * D * EH) * x.dtype.itemsize,
            transcendentals=S * EH,
        ),
        interpret=interpret,
    )(x, combine, w1m, b1r, w2m, b2)


@jax.custom_vjp
def moe_dense_fused(x, combine, w1m, b1r, w2m, b2):
    """Fused dense_fused expert compute: Pallas on TPU, pure-JAX
    reference elsewhere. See module docstring."""
    return jax.lax.platform_dependent(
        x, combine, w1m, b1r, w2m, b2,
        tpu=_moe_pallas,
        default=moe_dense_fused_reference,
    )


def _moe_fwd(x, combine, w1m, b1r, w2m, b2):
    out = moe_dense_fused(x, combine, w1m, b1r, w2m, b2)
    return out, (x, combine, w1m, b1r, w2m, b2)


def _moe_bwd(res, g):
    _, vjp = jax.vjp(moe_dense_fused_reference, *res)
    return vjp(g)


moe_dense_fused.defvjp(_moe_fwd, _moe_bwd)
