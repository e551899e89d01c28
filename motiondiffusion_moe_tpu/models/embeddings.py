"""Conditioning modules: time embedding, time-text fusion, AdaLN.

Capability match of ``text2motion/models/time.py``, ``gate.py``,
``stylization.py``.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


@jax.custom_vjp
def grad_clamp(x: jnp.ndarray, limit: float = 1.0) -> jnp.ndarray:
    """Identity forward; clamps the cotangent to [-limit, limit] on backward.

    Reproduces the per-tensor ``register_hook(lambda g: clamp(g, -1, 1))``
    the reference installs on q/k/v (``fast_attention.py:150-152``) — in JAX
    a custom_vjp instead of a mutable hook.
    """
    return x


def _grad_clamp_fwd(x, limit):
    return x, limit


def _grad_clamp_bwd(limit, g):
    return jnp.clip(g, -limit, limit), None


grad_clamp.defvjp(_grad_clamp_fwd, _grad_clamp_bwd)


def timestep_sinusoidal(timesteps: jnp.ndarray, dim: int,
                        max_period: int = 10000) -> jnp.ndarray:
    """Sinusoidal timestep features, cos-first ordering
    (``time.py:15-28``)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
    return embedding


class TimestepEmbedding(nn.Module):
    """``LearnableTimeEmbedding`` (``time.py:4-31``): sinusoidal -> MLP
    (Dense 2x -> SiLU -> Dense)."""

    embed_dim: int
    max_period: int = 10000
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        h = timestep_sinusoidal(timesteps, self.embed_dim, self.max_period)
        h = h.astype(self.dtype)
        h = nn.Dense(self.embed_dim * 2, dtype=self.dtype, name="mlp_0")(h)
        h = nn.silu(h)
        h = nn.Dense(self.embed_dim, dtype=self.dtype, name="mlp_1")(h)
        return h


class GatedFusion(nn.Module):
    """Sigmoid-gated time/text fusion (``gate.py:4-22``):
    g = sigmoid(Wt t + Wx x); fused = MLP(g*t + (1-g)*x)."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, time_emb: jnp.ndarray, text_emb: jnp.ndarray) -> jnp.ndarray:
        t = nn.Dense(self.embed_dim, dtype=self.dtype, name="proj_time")(time_emb)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, name="proj_text")(text_emb)
        gating = nn.sigmoid(t + x)
        fused = gating * t + (1 - gating) * x
        fused = nn.Dense(self.embed_dim, dtype=self.dtype, name="post_mlp_0")(fused)
        fused = nn.silu(fused)
        fused = nn.Dense(self.embed_dim, dtype=self.dtype, name="post_mlp_1")(fused)
        return fused


class StylizationBlock(nn.Module):
    """AdaLN / FiLM modulation (``stylization.py:5-31``):
    ``norm(h) * (1 + scale) + shift`` with zero-init output projection.

    DOCUMENTED DIVERGENCE: when ``emb`` dim != ``time_embed_dim`` the
    reference creates a FRESH RANDOM nn.Linear on every forward
    (``stylization.py:22-24``) — and that path is always hit in the live
    config because blocks are built with time_embed_dim=4*latent while
    fused_emb has dim latent (``transformer.py:203,237,321``). Un-jittable
    and non-learnable noise; replaced by a single learned projection
    (created once, trained normally).
    """

    latent_dim: int
    time_embed_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # init for the output projection: zeros by default (stylization.py:29);
    # PerformerSelfAttention overrides with xavier(0.1) (its module-wide
    # re-init clobbers the zero init, fast_attention.py:155-158)
    out_kernel_init: Any = nn.initializers.zeros
    emb_kernel_init: Any = None  # None -> flax Dense default
    # The fused AdaLN Pallas kernel (ops/adaln_pallas.py) wins standalone
    # (2x) but LOSES ~7% end-to-end: inside the whole-model jit XLA already
    # fuses this prologue into neighbors, and the pallas_call is a fusion
    # barrier. Off by default; kept as a building block.
    fused: bool = False

    @nn.compact
    def __call__(self, h: jnp.ndarray, emb: jnp.ndarray,
                 deterministic: bool = True,
                 pre_ln: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 ) -> jnp.ndarray:
        D = self.latent_dim
        dense_kw = ({"kernel_init": self.emb_kernel_init}
                    if self.emb_kernel_init is not None else {})
        if emb.shape[-1] != self.time_embed_dim:
            emb = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                           name="emb_proj", **dense_kw)(emb)
        emb_out = nn.Dense(2 * D, dtype=self.dtype,
                           name="emb_layers", **dense_kw)(nn.silu(emb))
        scale, shift = jnp.split(emb_out, 2, axis=-1)  # [B, D] each

        ln_scale = self.param("norm_scale", nn.initializers.ones, (D,))
        ln_bias = self.param("norm_bias", nn.initializers.zeros, (D,))
        w = self.param("out_kernel", self.out_kernel_init, (D, D))
        b = self.param("out_bias", nn.initializers.zeros, (D,))

        use_dropout = (not deterministic) and self.dropout > 0
        if pre_ln is not None:
            # Fused Performer epilogue (fast_attention.py:163-178 chain +
            # this block's LN/modulate): post-LN -> L2*sqrt(D) -> style-LN
            # -> modulate -> SiLU in ONE memory pass; only the zero/xavier
            # output matmul stays outside. Caller guarantees no dropout.
            assert not use_dropout, "pre_ln fused path is deterministic-only"
            from motiondiffusion_moe_tpu.ops.performer_pallas import (
                performer_epilogue)

            hmod = performer_epilogue(h, scale.astype(h.dtype),
                                      shift.astype(h.dtype),
                                      pre_ln[0], pre_ln[1],
                                      ln_scale, ln_bias)
            return hmod @ w.astype(self.dtype) + b.astype(self.dtype)
        if self.fused and not use_dropout:
            # fused LN+modulate+SiLU+Dense Pallas kernel
            from motiondiffusion_moe_tpu.ops.adaln_pallas import adaln_dense

            return adaln_dense(h, scale, shift, ln_scale, ln_bias,
                               w.astype(self.dtype), b.astype(self.dtype))

        from motiondiffusion_moe_tpu.models.norm import bf16_ln_stats

        # LN stats in f32 by default; compute dtype under LN_BF16_STATS=1
        # (the bf16-resident-LN train A/B — see models/norm.py)
        hf = h if bf16_ln_stats() else h.astype(jnp.float32)
        mu = hf.mean(-1, keepdims=True)
        var = ((hf - mu) ** 2).mean(-1, keepdims=True)
        normed = ((hf - mu) * jax.lax.rsqrt(var + 1e-6)
                  * ln_scale.astype(hf.dtype)
                  + ln_bias.astype(hf.dtype)).astype(self.dtype)
        hmod = normed * (1 + scale[:, None, :]) + shift[:, None, :]
        hmod = nn.silu(hmod)
        hmod = nn.Dropout(self.dropout)(hmod, deterministic=not use_dropout)
        return hmod @ w.astype(self.dtype) + b.astype(self.dtype)


class NormalizationBlock(nn.Module):
    """GroupNorm + LayerNorm stack (``models/utils.py:4-13``; used only by
    the reference's dead code, ported for inventory completeness)."""

    dim: int
    num_groups: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.GroupNorm(num_groups=self.num_groups, dtype=self.dtype,
                         name="group_norm")(x)
        return nn.LayerNorm(dtype=self.dtype, name="layer_norm")(h)


def stochastic_depth(block_fn, x: jnp.ndarray, survival_prob: float,
                     deterministic: bool,
                     rng: Optional[jax.Array]) -> jnp.ndarray:
    """Drop a whole residual block with prob 1-p during training
    (``time.py:35-48``).

    The reference draws ONE coin for the entire batch and returns the input
    unchanged when dropped, with no eval-time rescaling; matched exactly.
    Branchless (compute + select): flax ``sow`` side effects inside the
    block cannot escape a ``lax.cond`` branch.
    """
    if deterministic or survival_prob >= 1.0:
        return block_fn(x)
    keep = jax.random.bernoulli(rng, survival_prob)
    return jnp.where(keep, block_fn(x), x)
