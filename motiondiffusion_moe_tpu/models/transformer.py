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
from motiondiffusion_moe_tpu.parallel.mesh import (
    DATA_AXIS,
    PIPE_AXIS,
    SEQ_AXIS,
)


def generate_src_mask(T: int, length: jnp.ndarray) -> jnp.ndarray:
    """[B, T] float mask, 1 where frame index < length
    (vectorized ``transformer.py:284-289``)."""
    return (jnp.arange(T)[None, :] < length[:, None]).astype(jnp.float32)


def _block_kwargs(cfg: ModelConfig, time_embed_dim: int, mesh, use_kernels,
                  dtype) -> dict:
    """Constructor kwargs for one MoEDecoderLayer (shared by the named
    per-block layout and the nn.scan stacked layout)."""
    return dict(
        latent_dim=cfg.latent_dim, text_latent_dim=cfg.text_latent_dim,
        num_heads=cfg.num_heads, dropout=cfg.dropout,
        time_embed_dim=time_embed_dim, ffn_dim=cfg.ff_size,
        num_experts=cfg.num_experts, num_branches=cfg.moe_num_branches,
        top_k=cfg.moe_top_k, capacity_factor=cfg.moe_capacity_factor,
        use_moe=cfg.use_moe, moe_compute=cfg.moe_compute,
        mesh=mesh,
        # the flash-xattn kernel is a pallas_call too — same SPMD-opacity
        # as the Performer kernels, so it is disabled with them under SP
        use_fast_xattn=cfg.use_fast_xattn and use_kernels,
        chunk_size=cfg.xattn_chunk_size,
        use_kernels=use_kernels,
        num_features=cfg.num_random_features, dtype=dtype)


def _remat_policy(name: str):
    """jax.checkpoint policy for ModelConfig.remat_blocks (shared by both
    block layouts); raises on unknown names."""
    policies = {
        "dots": jax.checkpoint_policies.dots_saveable,
        # also save the fused Performer attention outputs so the backward
        # does not re-run the forward Pallas kernels
        "dots_named": jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.dots_saveable,
            jax.checkpoint_policies.save_only_these_names("favor_out")),
        "all": None,
    }
    if name not in policies:
        raise ValueError(
            f"remat_blocks={name!r}: expected one of "
            f"{sorted(policies)} (or '' to disable)")
    return policies[name]


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


class _StackStep(nn.Module):
    """One ``nn.scan`` step over a stacked decoder-block scale: the block
    plus branchless per-layer stochastic depth (the survival probability
    rides as the scanned input; ``time.py:41-48`` semantics — whole-batch
    coin, no rescale). Carry is the hidden state."""

    config: ModelConfig
    time_embed_dim: int
    mesh: Optional[Mesh] = None
    use_kernels: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, survival_p, xf, emb, src_mask, deterministic):
        out = MoEDecoderLayer(
            **_block_kwargs(self.config, self.time_embed_dim, self.mesh,
                            self.use_kernels, self.dtype),
            name="block")(h, xf, emb, src_mask, deterministic)
        if not deterministic:
            keep = jax.random.bernoulli(self.make_rng("stochdepth"),
                                        survival_p)
            out = jnp.where(keep, out, h)
        return out, None


def _make_scanned_stack(cfg: ModelConfig, time_embed_dim: int, mesh,
                        use_kernels, dtype, name: str):
    """An nn.scan over ``num_layers`` _StackSteps with stacked [L, ...]
    params (sown MoE aux values stack on a leading layer axis too)."""
    Step = _StackStep
    if cfg.remat_blocks:
        # "deterministic" (arg 6 counting self) is a static python bool
        Step = nn.remat(_StackStep, static_argnums=(6,),
                        policy=_remat_policy(cfg.remat_blocks))
    return nn.scan(
        Step,
        variable_axes={"params": 0, "moe_losses": 0, "moe_metrics": 0},
        split_rngs={"params": True, "dropout": True, "stochdepth": True},
        in_axes=(0, nn.broadcast, nn.broadcast, nn.broadcast, nn.broadcast),
        length=cfg.num_layers,
    )(config=cfg, time_embed_dim=time_embed_dim, mesh=mesh,
      use_kernels=use_kernels, dtype=dtype, name=name)


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
        # Pipeline parallelism: 'pipe' axis > 1 runs the stacked block
        # scales through the GPipe microbatch ring
        # (parallel/pipeline_parallel.py). PP requires the stacked layout
        # and composes with DP only — the ring body is manual per-device
        # code the SPMD partitioner cannot shard further.
        self._pp = (self.mesh is not None
                    and self.mesh.shape.get(PIPE_AXIS, 1) > 1)
        if self._pp:
            S = self.mesh.shape[PIPE_AXIS]
            if not cfg.scan_blocks:
                raise ValueError(
                    "pipeline parallelism needs scan_blocks=True (stages "
                    "are contiguous slices of the stacked layer axis)")
            if cfg.num_layers % S != 0:
                raise ValueError(
                    f"num_layers={cfg.num_layers} not divisible by "
                    f"pipeline stages ({S})")
            for ax in (SEQ_AXIS, "expert", "model"):
                if self.mesh.shape.get(ax, 1) > 1:
                    raise ValueError(
                        f"pipeline parallelism composes with 'data' only; "
                        f"mesh has {ax}={self.mesh.shape[ax]}")
            if cfg.moe_compute == "dispatch":
                raise ValueError(
                    "moe_compute='dispatch' (shard_map all-to-all) cannot "
                    "nest inside the pipeline ring; use 'dense' or "
                    "'dense_fused'")

        if cfg.scan_blocks:
            # ONE nn.scan per U-Net scale over stacked [L, ...] params:
            # the traced program shrinks ~Lx (compile time, program size)
            # and the stacked layout is what layer-sharded schemes
            # partition. Same math as the named layout (parity-tested);
            # stack_block_params/unstack_block_params convert checkpoints.
            self.decoder_blocks_low = _make_scanned_stack(
                cfg, self.time_embed_dim, self.mesh,
                not self._seq_sharded, dtype, name="blocks_low")
            self.decoder_blocks_high = _make_scanned_stack(
                cfg, self.time_embed_dim, self.mesh,
                not self._seq_sharded, dtype, name="blocks_high")
        else:
            block_kw = _block_kwargs(cfg, self.time_embed_dim, self.mesh,
                                     not self._seq_sharded, dtype)
            Block = MoEDecoderLayer
            if cfg.remat_blocks:
                # Per-block rematerialization: the flagship train step is
                # dominated by ~3000 small memory-bound backward fusions
                # reading stored forward intermediates from HBM
                # (BENCH_NOTES.md round-3 training profile); recomputing
                # the elementwise/LN chains from saved matmul outputs
                # trades cheap MXU FLOPs for that traffic. "deterministic"
                # (arg 5, counting self) is a static python bool.
                Block = nn.remat(MoEDecoderLayer, static_argnums=(5,),
                                 policy=_remat_policy(cfg.remat_blocks))
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

    def _run_blocks_pp(self, blocks, h, xf, emb, src_mask, deterministic,
                       survival):
        """GPipe ring over the 'pipe' mesh axis (see
        parallel/pipeline_parallel.py). Reads the stacked block params off
        the (already-initialized) scan stack and applies them functionally
        stage by stage."""
        from motiondiffusion_moe_tpu.parallel.pipeline_parallel import (
            gpipe, make_block_stage_fn, pp_num_microbatches)

        cfg = self.config
        stacked = blocks.variables["params"]["block"]
        # parent=None: a detached template (NOT a submodule of self) — it
        # is applied functionally per layer inside the ring with the
        # stacked params sliced to the local stage
        template = MoEDecoderLayer(**_block_kwargs(
            cfg, self.time_embed_dim, None, True, self._dtype),
            parent=None)
        S = self.mesh.shape[PIPE_AXIS]
        M = pp_num_microbatches(cfg.pipeline_microbatches, S)
        if deterministic:
            stage = make_block_stage_fn(template, True, cfg.remat_blocks)
            xs = (survival,)
        else:
            # ONE whole-batch coin per block per forward (time.py:41-48),
            # shared by every microbatch; block dropout keys per
            # (layer, microbatch)
            coins = jax.random.bernoulli(self.make_rng("stochdepth"),
                                         survival)
            keys = jax.random.split(self.make_rng("dropout"),
                                    (cfg.num_layers, M))
            stage = make_block_stage_fn(template, False, cfg.remat_blocks)
            xs = (survival, coins, keys)
        context = {"xf": xf, "emb": emb, "src_mask": src_mask}
        out, aux = gpipe(stage, stacked, {"h": h}, context, self.mesh,
                         M, xs)
        _last = lambda prev, new: new  # noqa: E731
        _zero = lambda: jnp.zeros((), jnp.float32)  # noqa: E731
        self.sow("moe_losses", f"pp_aux_{blocks.name}", aux,
                 init_fn=_zero, reduce_fn=_last)
        return out["h"]

    def _run_blocks(self, blocks, h, xf, emb, src_mask, deterministic):
        if self.config.scan_blocks:
            # scanned stack: stochastic depth happens inside the scan body
            # (survival probs ride as the scanned input)
            survival = jnp.asarray(self.survival_probs, jnp.float32)
            h = self._seq_constrain(h)
            if self._pp and not self.is_initializing():
                # init runs the plain scan (creates the stacked params);
                # apply runs the pipeline ring over the same params
                h = self._run_blocks_pp(blocks, h, xf, emb, src_mask,
                                        deterministic, survival)
            else:
                h, _ = blocks(h, survival, xf, emb, src_mask, deterministic)
            return self._seq_constrain(h)
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


def _stack_scale(tree: dict, prefix: str, stacked_name: str) -> dict:
    names = sorted((k for k in tree if k.startswith(prefix)),
                   key=lambda s: int(s[len(prefix):]))
    if not names:
        raise ValueError(f"no '{prefix}*' block params found to stack")
    subs = [tree[k] for k in names]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *subs)
    out = {k: v for k, v in tree.items() if k not in names}
    out[stacked_name] = {"block": stacked}
    return out


def stack_block_params(variables: dict) -> dict:
    """Convert a named per-block checkpoint (``block_low_0``...) to the
    ``scan_blocks=True`` stacked layout (``blocks_low/block`` with a
    leading [L] layer axis on every leaf). Inverse:
    :func:`unstack_block_params`."""
    p = _stack_scale(dict(variables["params"]), "block_low_", "blocks_low")
    p = _stack_scale(p, "block_high_", "blocks_high")
    return {**variables, "params": p}


def unstack_block_params(variables: dict) -> dict:
    """Convert a ``scan_blocks=True`` stacked checkpoint back to the named
    per-block layout."""
    p = dict(variables["params"])
    for stacked_name, prefix in (("blocks_low", "block_low_"),
                                 ("blocks_high", "block_high_")):
        if stacked_name not in p:
            raise ValueError(f"no '{stacked_name}' stacked params found")
        sub = p.pop(stacked_name)["block"]
        L = jax.tree_util.tree_leaves(sub)[0].shape[0]
        for i in range(L):
            p[f"{prefix}{i}"] = jax.tree.map(lambda x, i=i: x[i], sub)
    return {**variables, "params": p}


def sum_moe_aux_losses(collections) -> jnp.ndarray:
    """Sum every sown MoE aux loss (the analog of ``get_moe_loss``,
    ``transformer.py:279-287``). Pass the mutable-collections dict returned
    by ``apply(..., mutable=["moe_losses"])``."""
    losses = collections.get("moe_losses", {})
    leaves = jax.tree_util.tree_leaves(losses)
    if not leaves:
        return jnp.asarray(0.0)
    return sum(jnp.sum(l) for l in leaves)
