"""Attention suite: Performer (FAVOR+) self-attention, linear and exact
text cross-attention.

Capability match of ``text2motion/models/fast_attention.py``. Numerics
follow the reference exactly — including its stabilization quirks (0.1
scalings, shared q/k/v/output LayerNorm, the same-position denominator in
FastAttention) — because the model's training behavior depends on them.
TPU-first differences:

- the random-feature projection is a fixed (stop-gradient) parameter instead
  of a lazily-created, never-checkpointed tensor (``fast_attention.py:33-36``
  quirk: resampled per process/restart);
- the exp feature map runs in float32 regardless of compute dtype (bf16
  under/overflows the exp);
- the chunked exact cross-attention loop (``:301-330``) is computed as one
  whole-sequence softmax — bit-identical math (softmax is row-wise), and at
  T=196 the chunking is pure overhead on TPU. ``chunk_size`` is kept for
  config parity and used by the Pallas flash kernel tiling instead.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from motiondiffusion_moe_tpu.models.norm import layer_norm

from motiondiffusion_moe_tpu.models.embeddings import StylizationBlock, grad_clamp


def xavier_normal(gain: float = 1.0):
    """torch.nn.init.xavier_normal_ equivalent."""
    return nn.initializers.variance_scaling(
        scale=gain * gain, mode="fan_avg", distribution="normal")


def _orthogonal_feature_init(key, shape, dtype=jnp.float32):
    """Orthogonal random-feature matrix, column-normalized and scaled by
    head_dim**-0.25 (``fast_attention.py:20-27``).

    Reference quirk: ``torch.linalg.qr(randn(d, m), 'reduced')`` returns a
    [d, min(d, m)] Q, silently truncating m to d when m > d. We generate a
    proper [d, m] near-orthogonal matrix instead (full feature count).
    """
    d, m = shape
    w = jax.nn.initializers.orthogonal()(key, (max(d, m), max(d, m)), dtype)[:d, :m]
    w = w / jnp.linalg.norm(w, axis=0, keepdims=True)
    return w * (d ** -0.25)


class FastAttention(nn.Module):
    """FAVOR+-style linear attention core (``fast_attention.py:5-92``).

    Inputs q, k, v: [B, H, T, Dh]; optional mask [B, T, 1] or [B, 1, T].
    One LayerNorm (shared parameters) normalizes q, k, v and the output,
    exactly as the reference reuses ``self.norm`` four times.
    """

    head_dim: int
    num_features: int = 256
    eps: float = 1e-6
    use_pallas: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        norm = layer_norm(self.dtype, name="norm")
        projection = self.param("projection", _orthogonal_feature_init,
                                (self.head_dim, self.num_features))
        # fixed random features: zero gradient, never updated
        projection = jax.lax.stop_gradient(projection)

        q = norm(q)
        k = norm(k)
        v = norm(v)

        # L2 stabilization (fast_attention.py:54-56)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)

        if mask is not None:
            m = mask.astype(jnp.float32)
            if m.ndim == 3 and m.shape[-1] == 1:   # [B, T, 1] -> [B, 1, T]
                m = jnp.swapaxes(m, 1, 2)
        else:
            m = None

        # fused FAVOR+ core: exp feature maps (f32, clamp +-15, 0.1 scales),
        # kv/qkv contractions, and the reference-quirk SAME-POSITION
        # denominator (fast_attention.py:58-92) in one Pallas kernel on TPU
        # (pure-JAX math elsewhere; identical numerics either way).
        from motiondiffusion_moe_tpu.ops.performer_pallas import (
            favor_attention, favor_attention_reference)

        fn = favor_attention if self.use_pallas else favor_attention_reference
        output = fn(q.astype(jnp.float32), k.astype(jnp.float32),
                    v.astype(jnp.float32), projection.astype(jnp.float32),
                    m, self.eps)
        return norm(output.astype(self.dtype))


class PerformerSelfAttention(nn.Module):
    """Performer self-attention block (``fast_attention.py:94-179``).

    ``fused=True`` (default) runs the whole FastAttention body — shared
    LayerNorm, L2 stabilization, feature maps, contractions, denominator,
    output norm — as ONE Pallas kernel gridded over (batch, head), reading
    q/k/v straight in the Dense [B, T, H*D] layout (no head transpose).
    Numerically equivalent to the module path (same math, f32 internals).
    """

    latent_dim: int
    num_heads: int
    dropout: float
    time_embed_dim: int
    num_features: int = 256
    fused: bool = True
    # use_kernels=False keeps the SAME parameter tree (merged qkv Dense,
    # fa_norm/projection params) but computes the FAVOR+ core and epilogue
    # with the pure-JAX reference even on TPU. Needed under sequence
    # parallelism: a pallas_call is opaque to the SPMD partitioner, while
    # the reference einsums let XLA close the kv-moment reduction over the
    # sharded T axis with an all-reduce. Numerics are identical (the
    # kernels are parity-tested against these references).
    use_kernels: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 src_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        B, T, D = x.shape
        H = self.num_heads
        head_dim = D // H
        init = xavier_normal(0.1)  # fast_attention.py:155-158

        h = layer_norm(self.dtype, name="pre_norm")(x)

        if self.fused:
            from motiondiffusion_moe_tpu.ops.performer_pallas import (
                favor_attention_qkv, favor_qkv_reference)

            # ONE merged [D, 3D] matmul instead of three [D, D] ones (q|k|v
            # column blocks). Init matches per-block torch xavier_normal(0.1)
            # stats: std = 0.1 * sqrt(2 / (D + D)), NOT fan_avg of (D, 3D).
            qkv_init = nn.initializers.normal(0.1 * (2.0 / (2 * D)) ** 0.5)
            qkv = nn.Dense(3 * D, kernel_init=qkv_init, dtype=self.dtype,
                           name="qkv")(h)
            qkv = grad_clamp(qkv)

            ln_scale = self.param("fa_norm_scale", nn.initializers.ones,
                                  (head_dim,))
            ln_bias = self.param("fa_norm_bias", nn.initializers.zeros,
                                 (head_dim,))
            projection = jax.lax.stop_gradient(self.param(
                "fa_projection", _orthogonal_feature_init,
                (head_dim, self.num_features)))
            m = src_mask
            if m is not None and m.ndim == 3:
                m = m[..., 0]  # [B, T, 1] -> [B, T]
            if self.use_kernels:
                attn_out = favor_attention_qkv(
                    qkv, ln_scale, ln_bias, projection, m)
            else:
                # SPMD-partitionable path: same math, plain einsums; under
                # a seq-sharded constraint XLA all-reduces the kv moments
                attn_out = favor_qkv_reference(
                    qkv, ln_scale, ln_bias, projection, m)
            # identity outside jax.checkpoint; under remat_blocks=
            # "dots_named" marks the fused-kernel output as saved so the
            # backward pass does not re-run the forward Pallas kernel
            from jax.ad_checkpoint import checkpoint_name
            attn_out = checkpoint_name(attn_out, "favor_out")
            attn_out = nn.Dropout(self.dropout)(attn_out,
                                                deterministic=deterministic)
        else:
            q = nn.Dense(D, kernel_init=init, dtype=self.dtype,
                         name="query")(h)
            k = nn.Dense(D, kernel_init=init, dtype=self.dtype,
                         name="key")(h)
            v = nn.Dense(D, kernel_init=init, dtype=self.dtype,
                         name="value")(h)
            q, k, v = grad_clamp(q), grad_clamp(k), grad_clamp(v)
            def heads(t):
                return t.reshape(B, T, H, head_dim).transpose(0, 2, 1, 3) * 0.1

            attn_out = FastAttention(head_dim=head_dim,
                                     num_features=self.num_features,
                                     dtype=self.dtype, name="fast_attention")(
                heads(q), heads(k), heads(v), mask=src_mask)
            attn_out = nn.Dropout(self.dropout)(attn_out,
                                                deterministic=deterministic)
            attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, T, D)

        attn_out = nn.Dense(D, kernel_init=init, dtype=self.dtype,
                            name="proj_out_0")(attn_out)
        attn_out = nn.gelu(attn_out)
        attn_out = nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)
        attn_out = nn.Dense(D, kernel_init=init, dtype=self.dtype,
                            name="proj_out_1")(attn_out)
        attn_out = nn.Dropout(self.dropout)(attn_out, deterministic=deterministic)

        # Epilogue: post-LN -> unit sphere * sqrt(D) (fast_attention.py:
        # 163-178) -> StylizationBlock. Runs in float32 (torch-parity; the
        # reference is f32 throughout) and, when no dropout is active, as
        # ONE fused Pallas pass (performer_epilogue) instead of three
        # HBM-roofline normalization passes.
        post_scale = self.param("post_norm_scale", nn.initializers.ones,
                                (D,))
        post_bias = self.param("post_norm_bias", nn.initializers.zeros,
                               (D,))
        # reference quirk: the module-wide xavier(0.1) re-init OVERRIDES the
        # zero-init of this style block's output layer (fast_attention.py:
        # 155-158 runs after StylizationBlock.__init__) — reproduced via
        # out_kernel_init.
        style = StylizationBlock(
            latent_dim=D, time_embed_dim=self.time_embed_dim,
            dropout=self.dropout, dtype=self.dtype,
            out_kernel_init=init, emb_kernel_init=init, name="style_block")
        use_dropout = (not deterministic) and self.dropout > 0
        if not use_dropout and self.use_kernels:
            style_out = style(attn_out, emb, deterministic,
                              pre_ln=(post_scale, post_bias))
        else:
            hf = attn_out.astype(jnp.float32)
            mu = hf.mean(-1, keepdims=True)
            var = ((hf - mu) ** 2).mean(-1, keepdims=True)
            hf = (hf - mu) * jax.lax.rsqrt(var + 1e-6) * post_scale + post_bias
            hf = hf / jnp.maximum(
                jnp.linalg.norm(hf, axis=-1, keepdims=True), 1e-12)
            hf = hf * (D ** 0.5)
            style_out = style(hf.astype(self.dtype), emb, deterministic)
        return x + 0.1 * style_out


class DualSelfAttentionBlock(nn.Module):
    """Two stacked Performers ('local' then 'global') + projected skip
    (``fast_attention.py:185-226``)."""

    latent_dim: int
    num_heads: int
    dropout: float
    time_embed_dim: int
    num_features: int = 256
    use_kernels: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 src_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        h = layer_norm(self.dtype, name="pre_norm")(x)
        local_out = PerformerSelfAttention(
            latent_dim=self.latent_dim, num_heads=self.num_heads,
            dropout=self.dropout, time_embed_dim=self.time_embed_dim,
            num_features=self.num_features, dtype=self.dtype,
            use_kernels=self.use_kernels,
            name="local_attn")(h, emb, src_mask, deterministic)
        global_out = PerformerSelfAttention(
            latent_dim=self.latent_dim, num_heads=self.num_heads,
            dropout=self.dropout, time_embed_dim=self.time_embed_dim,
            num_features=self.num_features, dtype=self.dtype,
            use_kernels=self.use_kernels,
            name="global_attn")(local_out, emb, src_mask, deterministic)

        skip = nn.Dense(self.latent_dim, dtype=self.dtype, name="skip_proj")(x)
        skip = nn.Dropout(self.dropout)(skip, deterministic=deterministic)
        skip = nn.gelu(skip)

        out = skip + 0.1 * global_out
        return layer_norm(self.dtype, name="post_norm")(out)


class LinearTemporalCrossAttention(nn.Module):
    """Softmax-kernel linear cross-attention over text tokens with a scalar
    sigmoid gate (``fast_attention.py:227-258``)."""

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, xf: jnp.ndarray, emb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        D = x.shape[-1]
        H = self.num_heads

        xn = layer_norm(self.dtype, name="norm")(x)
        tn = layer_norm(self.dtype, name="text_norm")(xf)
        qd = nn.Dense(D, dtype=self.dtype, name="query")(xn)
        kd = nn.Dense(D, dtype=self.dtype, name="key")(tn)
        vd = nn.Dense(D, dtype=self.dtype, name="value")(tn)

        if deterministic:
            # Sampling: heads as lane-aligned 128-wide SLICES of the Dense
            # outputs, not a [B, T, H, dh] reshape — every softmax and
            # contraction then runs in the native (8, 128) tiling with zero
            # relayouts. The reshape form tiles the per-head reduces as
            # (4, 128) sublane strides (13x off the HBM roofline on v5e,
            # profiled) and forces Mosaic head-layout copies around both
            # einsums. Measured 94 vs 148 us/call standalone at the flagship
            # shape (B=32, T=196, N=77, D=512, H=4) and 20.8 vs 19.7
            # motions/s end-to-end. Same math as the reshape form (per-head
            # contractions), same params.
            dh = D // H
            ys = []
            for h in range(H):
                sl = slice(h * dh, (h + 1) * dh)
                qh = jax.nn.softmax(qd[..., sl], axis=-1)   # [B, T, dh]
                kh = jax.nn.softmax(kd[..., sl], axis=1)    # [B, N, dh]
                attn_h = jnp.einsum("bnd,bnl->bdl", kh, vd[..., sl])
                ys.append(jnp.einsum("btd,bdl->btl", qh, attn_h))
            y = jnp.concatenate(ys, axis=-1)                # [B, T, D]
        else:
            # Training: the BACKWARD of the sliced form fragments into
            # per-head concat/slice chains and measured at-best neutral,
            # likely slower (BENCH_NOTES.md round-3 second pass); the
            # batched-head einsum form differentiates into two clean
            # batched matmuls. The per-head q softmax still runs on the
            # FREE contiguous [B, T*H, dh] view (standard (8, 128) tiling
            # for the reduce).
            B, T = qd.shape[0], qd.shape[1]
            N = kd.shape[1]
            q = jax.nn.softmax(qd.reshape(B, T * H, -1),
                               axis=-1).reshape(B, T, H, -1)
            k = jax.nn.softmax(kd.reshape(B, N, H, -1), axis=1)
            v = vd.reshape(B, N, H, -1)
            attention = jnp.einsum("bnhd,bnhl->bhdl", k, v)
            y = jnp.einsum("bnhd,bhdl->bnhl", q, attention).reshape(B, T, D)

        gate = self.param("adaptive_gate", nn.initializers.zeros, (1,))
        alpha = nn.sigmoid(gate.astype(self.dtype))
        style = StylizationBlock(latent_dim=D, time_embed_dim=self.time_embed_dim,
                                 dropout=self.dropout, dtype=self.dtype,
                                 name="proj_out")(y, emb, deterministic)
        return x + alpha * style


class GatedCrossAttention(nn.Module):
    """Per-channel gated wrapper around LinearTemporalCrossAttention
    (``fast_attention.py:260-272``)."""

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, xf: jnp.ndarray, emb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        ca_out = LinearTemporalCrossAttention(
            latent_dim=self.latent_dim, text_latent_dim=self.text_latent_dim,
            num_heads=self.num_heads, dropout=self.dropout,
            time_embed_dim=self.time_embed_dim, dtype=self.dtype,
            name="base_ca")(x, xf, emb, deterministic)
        gate = self.param("gate", nn.initializers.zeros, (self.latent_dim,))
        alpha = nn.sigmoid(gate.astype(self.dtype)).reshape(1, 1, -1)
        return x + alpha * (ca_out - x)


class CrossAttentionBlock(nn.Module):
    """Exact softmax cross-attention + small residual FFN
    (``MemoryEfficientCrossAttentionBlock``, ``fast_attention.py:274-330``).

    Whole-sequence computation replaces the query-chunk loop (identical
    math); a Pallas flash-attention kernel covers the genuinely
    memory-bound regime.
    """

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    chunk_size: int = 256  # kept for config parity; tiling hint for Pallas
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # The fused fast-layout kernel (ops/flash_attention.xattn_fastlayout)
    # is numerically verified on TPU but LOSES ~0.4% end-to-end at the
    # flagship shape (18.91 vs 18.99 motions/s): at N=77 text keys the
    # einsum path's score tensors are small enough that XLA's own fusion
    # beats the pallas_call fusion barrier. Off by default; becomes
    # relevant for long-context text conditioning.
    use_fast_xattn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, xf: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        B, T, D = x.shape
        N = xf.shape[1]
        H = self.num_heads
        head_dim = D // H
        scale = head_dim ** -0.5

        q2 = nn.Dense(D, dtype=self.dtype, name="query")(x)
        k2 = nn.Dense(D, dtype=self.dtype, name="key")(xf)
        v2 = nn.Dense(D, dtype=self.dtype, name="value")(xf)

        use_dropout = (not deterministic) and self.dropout > 0
        if self.use_fast_xattn and mask is None and not use_dropout:
            # fast-layout fused kernel: scores/softmax/probs@v stay
            # VMEM-resident, q/k/v read straight in the Dense layout (no
            # [B,H,T,N] HBM round-trip, no head transpose)
            from motiondiffusion_moe_tpu.ops.flash_attention import (
                xattn_fastlayout)

            out = xattn_fastlayout(q2, k2, v2, H, scale)
        else:
            q = q2.reshape(B, T, H, head_dim)
            k = k2.reshape(B, N, H, head_dim)
            v = v2.reshape(B, N, H, head_dim)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
            if mask is not None:
                scores = scores + mask[:, None, :, :]
            probs = jax.nn.softmax(scores.astype(jnp.float32),
                                   axis=-1).astype(self.dtype)
            probs = nn.Dropout(self.dropout)(probs,
                                             deterministic=deterministic)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, D)
        out = nn.Dense(D, dtype=self.dtype, name="out")(out)

        # small residual FFN (fast_attention.py:293-299,327-329)
        h = layer_norm(self.dtype, name="ffn_norm")(out)
        h = nn.Dense(D * 4, dtype=self.dtype, name="ffn_0")(h)
        h = nn.gelu(h)
        h = nn.Dense(D, dtype=self.dtype, name="ffn_1")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        out = out + h
        return x + out
