"""The MoE motion-diffusion denoiser: a 2-scale U-Net transformer.

Capability match of ``text2motion/models/transformer.py:17-64,166-361``
(``MoEExtendedDecoderLayer`` + ``MotionTransformer``), TPU-first:

- static shapes throughout (pad to ``max_frames`` + mask; ``generate_src_mask``
  becomes a vectorized ``arange < length``, replacing the Python loop at
  ``transformer.py:284-289``);
- stochastic depth via ``lax.cond`` on a bernoulli draw (one coin per block
  per step, like the reference's ``torch.rand(1)``, ``time.py:41-48``);
- DOCUMENTED DIVERGENCE: the reference creates a fresh RANDOM
  ``nn.Linear(text_latent, latent)`` on every forward when projecting
  xf_proj (``transformer.py:313-315``) — replaced by a learned ``text_proj``
  created once. Same class of fix as StylizationBlock's emb_proj.
- the text encoder is a pluggable submodule (hash encoder or DeBERTa);
  callers may pass precomputed (xf_proj, xf_out) to skip it — that is how
  sampling encodes text once for all 1000 scan steps, where the reference
  re-encodes the empty uncond prompt every step
  (``gaussian_diffusion.py:1058-1072``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh
import numpy as np

from motiondiffusion_moe_tpu.config import ModelConfig
from motiondiffusion_moe_tpu.models.attention import (
    CrossAttentionBlock,
    DualSelfAttentionBlock,
    GatedCrossAttention,
)
from motiondiffusion_moe_tpu.models.embeddings import (
    GatedFusion,
    TimestepEmbedding,
)
from motiondiffusion_moe_tpu.models.moe import DenseFFN, MoEMultiBranchFFN
from motiondiffusion_moe_tpu.models.text_encoder import TextEncoding, get_text_encoder
from motiondiffusion_moe_tpu.parallel.mesh import DATA_AXIS, SEQ_AXIS


def generate_src_mask(T: int, length: jnp.ndarray) -> jnp.ndarray:
    """[B, T] float mask, 1 where frame index < length
    (vectorized ``transformer.py:284-289``)."""
    return (jnp.arange(T)[None, :] < length[:, None]).astype(jnp.float32)


class MoEDecoderLayer(nn.Module):
    """One decoder block (``MoEExtendedDecoderLayer``,
    ``transformer.py:17-64``): dual Performer self-attn -> gated linear
    cross-attn -> MoE multi-branch FFN -> exact cross-attn."""

    latent_dim: int
    text_latent_dim: int
    num_heads: int
    dropout: float
    time_embed_dim: int
    ffn_dim: int
    num_experts: int = 8
    num_branches: int = 2
    top_k: int = 2
    capacity_factor: float = 2.0
    use_moe: bool = True
    moe_compute: str = "dense_fused"
    mesh: Optional[Mesh] = None
    use_fast_xattn: bool = False
    chunk_size: int = 256
    num_features: int = 256
    # False under sequence parallelism: Pallas kernels are opaque to the
    # SPMD partitioner; the pure-JAX attention path partitions over the
    # sharded T axis (see PerformerSelfAttention.use_kernels)
    use_kernels: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, xf: jnp.ndarray, emb: jnp.ndarray,
                 src_mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = DualSelfAttentionBlock(
            latent_dim=self.latent_dim, num_heads=self.num_heads,
            dropout=self.dropout, time_embed_dim=self.time_embed_dim,
            num_features=self.num_features, dtype=self.dtype,
            use_kernels=self.use_kernels,
            name="dual_self_attn")(x, emb, src_mask, deterministic)
        x = GatedCrossAttention(
            latent_dim=self.latent_dim, text_latent_dim=self.text_latent_dim,
            num_heads=self.num_heads, dropout=self.dropout,
            time_embed_dim=self.time_embed_dim, dtype=self.dtype,
            name="cross_attn")(x, xf, emb, deterministic)
        if self.use_moe:
            x = MoEMultiBranchFFN(
                latent_dim=self.latent_dim, ffn_dim=self.ffn_dim,
                num_experts=self.num_experts, num_branches=self.num_branches,
                top_k=self.top_k, capacity_factor=self.capacity_factor,
                dropout=self.dropout, time_embed_dim=self.time_embed_dim,
                moe_compute=self.moe_compute, mesh=self.mesh,
                dtype=self.dtype,
                name="ffn")(x, emb, deterministic)
        else:
            x = DenseFFN(
                latent_dim=self.latent_dim, ffn_dim=self.ffn_dim,
                num_branches=self.num_branches, dropout=self.dropout,
                time_embed_dim=self.time_embed_dim, dtype=self.dtype,
                name="ffn")(x, emb, deterministic)
        x = CrossAttentionBlock(
            latent_dim=self.latent_dim, text_latent_dim=self.text_latent_dim,
            num_heads=self.num_heads, chunk_size=self.chunk_size,
            dropout=self.dropout, dtype=self.dtype,
            use_fast_xattn=self.use_fast_xattn,
            name="sd_cross_attn")(x, xf, mask=None, deterministic=deterministic)
        return x


class MotionTransformer(nn.Module):
    """2-scale U-Net denoiser (``transformer.py:166-361``).

    ``mesh``: optional device mesh handed to the MoE layers so
    ``moe_compute='dispatch'`` routes through the explicit shard_map
    all-to-all over the 'expert' axis (static module metadata — it does
    not change the param tree).
    """

    config: ModelConfig
    mesh: Optional[Mesh] = None

    @property
    def time_embed_dim(self) -> int:
        return self.config.latent_dim * self.config.time_embed_mult

    def setup(self):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype != "bfloat16" else jnp.bfloat16
        # compute dtype: params are always f32 (flax keeps param dtype f32
        # when dtype=bf16 via default param_dtype)
        self._dtype = dtype

        self.sequence_embedding = self.param(
            "sequence_embedding", nn.initializers.normal(1.0),
            (cfg.max_frames, cfg.latent_dim))

        self.learnable_time_embed = TimestepEmbedding(
            embed_dim=cfg.latent_dim, dtype=dtype)
        self.gated_fusion = GatedFusion(embed_dim=cfg.latent_dim, dtype=dtype)
        _, self.text_encoder = get_text_encoder(cfg)
        self.time_embed_0 = nn.Dense(self.time_embed_dim, dtype=dtype)
        self.time_embed_1 = nn.Dense(self.time_embed_dim, dtype=dtype)
        self.time_proj = nn.Dense(cfg.latent_dim, dtype=dtype)
        # learned text projection (fixes transformer.py:313-315)
        self.text_proj = nn.Dense(cfg.latent_dim, dtype=dtype)

        self.joint_embed = nn.Dense(cfg.latent_dim, dtype=dtype)
        self.downsample = nn.Conv(cfg.latent_dim, kernel_size=(2,),
                                  strides=(2,), dtype=dtype)
        self.upsample = nn.ConvTranspose(cfg.latent_dim, kernel_size=(2,),
                                         strides=(2,), dtype=dtype)

        # Sequence parallelism: when the mesh carries a 'seq' axis > 1,
        # activations are sharded on T (constraints in __call__/_run_blocks)
        # and the attention stack runs its SPMD-partitionable pure-JAX path
        # (Pallas calls cannot be partitioned over a sharded operand axis).
        self._seq_sharded = (self.mesh is not None
                             and self.mesh.shape.get(SEQ_AXIS, 1) > 1)

        block_kw = dict(
            latent_dim=cfg.latent_dim, text_latent_dim=cfg.text_latent_dim,
            num_heads=cfg.num_heads, dropout=cfg.dropout,
            time_embed_dim=self.time_embed_dim, ffn_dim=cfg.ff_size,
            num_experts=cfg.num_experts, num_branches=cfg.moe_num_branches,
            top_k=cfg.moe_top_k, capacity_factor=cfg.moe_capacity_factor,
            use_moe=cfg.use_moe, moe_compute=cfg.moe_compute,
            mesh=self.mesh,
            use_fast_xattn=cfg.use_fast_xattn,
            chunk_size=cfg.xattn_chunk_size,
            use_kernels=not self._seq_sharded,
            num_features=cfg.num_random_features, dtype=dtype)
        Block = MoEDecoderLayer
        if cfg.remat_blocks:
            # Per-block rematerialization: the flagship train step is
            # dominated by ~3000 small memory-bound backward fusions
            # reading stored forward intermediates from HBM
            # (BENCH_NOTES.md round-3 training profile); recomputing the
            # elementwise/LN chains from saved matmul outputs trades cheap
            # MXU FLOPs for that traffic. "deterministic" (arg 5, counting
            # self) is a static python bool.
            policies = {
                "dots": jax.checkpoint_policies.dots_saveable,
                # also save the fused Performer attention outputs so the
                # backward does not re-run the forward Pallas kernels
                "dots_named": jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "favor_out")),
                "all": None,
            }
            if cfg.remat_blocks not in policies:
                raise ValueError(
                    f"remat_blocks={cfg.remat_blocks!r}: expected one of "
                    f"{sorted(policies)} (or '' to disable)")
            policy = policies[cfg.remat_blocks]
            Block = nn.remat(MoEDecoderLayer, static_argnums=(5,),
                             policy=policy)
        self.decoder_blocks_low = [
            Block(**block_kw, name=f"block_low_{i}")
            for i in range(cfg.num_layers)]
        self.decoder_blocks_high = [
            Block(**block_kw, name=f"block_high_{i}")
            for i in range(cfg.num_layers)]
        # survival probs linspace(1.0 -> stochastic_depth_min)
        self.survival_probs = np.linspace(
            1.0, cfg.stochastic_depth_min, cfg.num_layers)

        self.out = nn.Dense(cfg.input_feats,
                            kernel_init=nn.initializers.zeros,
                            bias_init=nn.initializers.zeros, dtype=dtype)

    def encode_text(self, text_ids: jnp.ndarray,
                    deterministic: bool = True) -> TextEncoding:
        return self.text_encoder(text_ids, deterministic=deterministic)

    def _seq_constrain(self, h: jnp.ndarray) -> jnp.ndarray:
        """Pin [B, T, D] activations to (data, seq) sharding when the mesh
        has a 'seq' axis — the anchor XLA propagates sequence parallelism
        from. No-op otherwise."""
        if not self._seq_sharded:
            return h
        from jax.sharding import NamedSharding, PartitionSpec as P
        return jax.lax.with_sharding_constraint(
            h, NamedSharding(self.mesh, P(DATA_AXIS, SEQ_AXIS, None)))

    def _run_blocks(self, blocks, h, xf, emb, src_mask, deterministic):
        for i, block in enumerate(blocks):
            p = float(self.survival_probs[i])
            h = self._seq_constrain(h)
            out = block(h, xf, emb, src_mask, deterministic)
            if deterministic or p >= 1.0:
                h = out
            else:
                # Branchless stochastic depth: compute the block and SELECT
                # (time.py:41-48 semantics — whole-batch coin, no rescale).
                # lax.cond would skip the dropped block's FLOPs but cannot
                # carry flax `sow` side effects (MoE aux losses) out of the
                # branch without leaking tracers.
                keep = jax.random.bernoulli(self.make_rng("stochdepth"), p)
                h = jnp.where(keep, out, h)
        return h

    def __call__(self, x: jnp.ndarray, timesteps: jnp.ndarray,
                 length: jnp.ndarray,
                 text_ids: Optional[jnp.ndarray] = None,
                 xf_proj: Optional[jnp.ndarray] = None,
                 xf_out: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        B, T, D = x.shape
        dtype = self._dtype

        # 1) text encode (transformer.py:309-315)
        if xf_proj is None or xf_out is None:
            enc = self.encode_text(text_ids, deterministic)
            xf_proj, xf_out = enc.pooled, enc.tokens
        xf_proj = self.text_proj(xf_proj.astype(dtype))

        # 2) fuse time + text (transformer.py:317-321)
        time_emb = self.learnable_time_embed(timesteps)
        t_h = self.time_embed_0(time_emb)
        t_h = nn.silu(t_h)
        t_h = self.time_embed_1(t_h)
        time_emb_proj = self.time_proj(t_h)
        fused_emb = self.gated_fusion(time_emb_proj, xf_proj)

        # 3) embed motion + positions (transformer.py:324-326)
        h = self.joint_embed(x.astype(dtype))
        h = h + self.sequence_embedding[None, :T, :].astype(dtype)
        h = self._seq_constrain(h)

        src_mask = generate_src_mask(T, length)[..., None]  # [B, T, 1]

        # 4) coarse scale (transformer.py:332-344)
        h_low = self.downsample(h)
        t_low = h_low.shape[1]
        length_low = (length // 2).astype(length.dtype)
        src_mask_low = generate_src_mask(t_low, length_low)[..., None]
        h_low = self._run_blocks(self.decoder_blocks_low, h_low,
                                 xf_out.astype(dtype), fused_emb,
                                 src_mask_low, deterministic)

        # 5) upsample + skip (transformer.py:347-353)
        h_up = self.upsample(h_low)
        h_combined = self._seq_constrain(h_up[:, :T] + h)

        # 6) full scale (transformer.py:356-357)
        h_combined = self._run_blocks(self.decoder_blocks_high, h_combined,
                                      xf_out.astype(dtype), fused_emb,
                                      src_mask, deterministic)

        # 7) zero-init out (transformer.py:360)
        return self.out(h_combined).astype(jnp.float32)


def sum_moe_aux_losses(collections) -> jnp.ndarray:
    """Sum every sown MoE aux loss (the analog of ``get_moe_loss``,
    ``transformer.py:279-287``). Pass the mutable-collections dict returned
    by ``apply(..., mutable=["moe_losses"])``."""
    losses = collections.get("moe_losses", {})
    leaves = jax.tree_util.tree_leaves(losses)
    if not leaves:
        return jnp.asarray(0.0)
    return sum(jnp.sum(l) for l in leaves)
