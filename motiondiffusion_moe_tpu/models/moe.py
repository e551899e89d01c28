"""Top-k Switch-style Mixture-of-Experts feed-forward.

Capability match of ``text2motion/models/switch_moe.py`` +
``multi_branch.py``, redesigned for TPU static shapes:

- The reference routes with a shape-dynamic Python loop over experts
  (``switch_moe.py:97-109``) — impossible under jit. Here routing is fully
  vectorized with three interchangeable compute paths:

  * ``dense_fused`` (default) — all experts as TWO stacked matmuls with the
    combine gates applied to the hidden activations (algebraically equal to
    per-expert combination; never materializes the [E, S, D] tensor).
    Fastest on one device; merging the E dim defeats SPMD expert sharding.
  * ``dense`` — per-expert einsums keeping E a named contractable dim the
    XLA SPMD partitioner shards over the 'expert' mesh axis. Overcompute
    factor E/k either way — zero gather/scatter, MXU-shaped, the right
    trade for E<=8 at this model size.
  * ``dispatch`` — classic capacity-factor dispatch/combine (one-hot
    position-in-expert), the layout expert-parallel all-to-all needs. Exact
    match of ``dense`` when no token overflows capacity.

- DOCUMENTED DIVERGENCE (SURVEY.md §2.1 #2): the reference's load-balancing
  loss is computed from detached ``.item()`` counters and therefore carries
  NO gradient (``switch_moe.py:70-92,113-145``). We use the differentiable
  Switch-Transformer form ``E * sum_i f_i * P_i`` (f_i = fraction of tokens
  whose top-1 is expert i, P_i = mean router probability of expert i), which
  is 1 at perfect balance. The reference's usage/importance counters are
  still computed and exposed as metrics via ``sow``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from motiondiffusion_moe_tpu.models.norm import layer_norm
from jax.sharding import Mesh


def switch_aux_loss(probs: jnp.ndarray, top1_idx: jnp.ndarray,
                    num_experts: int) -> jnp.ndarray:
    """Differentiable Switch load-balancing loss: E * sum_i f_i * P_i."""
    f = jnp.mean(jax.nn.one_hot(top1_idx, num_experts, dtype=probs.dtype),
                 axis=0)
    p = jnp.mean(probs, axis=0)
    return num_experts * jnp.sum(f * p)


class SwitchMoELayer(nn.Module):
    """Top-k gated MoE over per-token FFN experts
    (``switch_moe.py:7-145``).

    Expert body: Dense(hidden) -> GELU -> Dense(latent), gate zero-init
    (``switch_moe.py:16-29``).
    """

    latent_dim: int
    hidden_dim: int
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 2.0
    # "dense_fused": all-experts as two stacked matmuls (fastest on one
    #   device; merging the E dim defeats XLA-SPMD expert sharding)
    # "dense": per-expert einsums XLA can partition over an 'expert' axis
    # "dispatch": static-capacity dispatch/combine (the EP all-to-all
    #   layout). With a `mesh` whose 'expert' axis is >1 this routes through
    #   the EXPLICIT shard_map all-to-all (parallel.moe_parallel): the right
    #   layout at high expert counts where the dense einsum's E/top_k
    #   overcompute (8x at E=16 top-2) stops being a good trade.
    compute: str = "dense_fused"
    mesh: Optional[Mesh] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        orig_shape = x.shape
        D = orig_shape[-1]
        x_flat = x.reshape(-1, D)
        S = x_flat.shape[0]
        E = self.num_experts

        gate_logits = nn.Dense(E, kernel_init=nn.initializers.zeros,
                               bias_init=nn.initializers.zeros,
                               dtype=self.dtype, name="gate")(x_flat)
        probs = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
        top_vals, top_idx = jax.lax.top_k(probs, self.top_k)  # [S, k]

        # metrics (the reference's buffers, switch_moe.py:70-92) + aux loss
        top1 = top_idx[:, 0]
        usage = jnp.sum(jax.nn.one_hot(top1, E, dtype=jnp.float32), axis=0)
        importance = jnp.zeros((E,), jnp.float32)
        for j in range(self.top_k):
            importance = importance + jnp.sum(
                jax.nn.one_hot(top_idx[:, j], E, dtype=jnp.float32)
                * top_vals[:, j:j + 1], axis=0)
        # overwrite-reduce instead of the default append: flax 0.12's
        # linen-over-nnx bridge traces apply twice under `mutable`, which
        # would double-count appended values.
        _last = lambda prev, new: new
        _zero = lambda: jnp.zeros((), jnp.float32)
        self.sow("moe_metrics", "expert_usage", usage,
                 init_fn=_zero, reduce_fn=_last)
        self.sow("moe_metrics", "expert_importance", importance,
                 init_fn=_zero, reduce_fn=_last)
        self.sow("moe_losses", "aux", switch_aux_loss(probs, top1, E),
                 init_fn=_zero, reduce_fn=_last)

        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (E, D, self.hidden_dim))
        b1 = self.param("b1", nn.initializers.zeros, (E, self.hidden_dim))
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (E, self.hidden_dim, D))
        b2 = self.param("b2", nn.initializers.zeros, (E, D))
        w1 = w1.astype(self.dtype)
        b1 = b1.astype(self.dtype)
        w2 = w2.astype(self.dtype)
        b2 = b2.astype(self.dtype)
        top_vals = top_vals.astype(self.dtype)

        if self.compute in ("dense", "dense_fused"):
            # combine weight per (token, expert): sum of top-k gate probs
            combine_se = jnp.zeros((S, E), self.dtype)
            for j in range(self.top_k):
                combine_se = combine_se + (
                    jax.nn.one_hot(top_idx[:, j], E, dtype=self.dtype)
                    * top_vals[:, j:j + 1])
            if self.compute == "dense_fused":
                # All-experts compute as TWO stacked matmuls (MXU-shaped):
                #   [S, D] @ [D, E*hid] -> gelu -> (weight by combine) ->
                #   [S, E*hid] @ [E*hid, D].
                # Weighting the HIDDEN activations by combine_se before the
                # second matmul is algebraically identical to combining the
                # per-expert outputs (linearity), but never materializes the
                # [E, S, D] output tensor — ~2/3 less intermediate HBM
                # traffic than the per-expert einsum chain and far bigger
                # matmuls. Single-device only by design: merging the E dim
                # into a matmul defeats XLA-SPMD expert partitioning.
                hid = self.hidden_dim
                w1m = jnp.transpose(w1, (1, 0, 2)).reshape(D, E * hid)
                import os as _os
                if (deterministic and hid % 128 == 0 and D % 128 == 0
                        and _os.environ.get("MOE_FUSED_KERNEL", "0") != "0"):
                    # Fused Pallas kernel for this chain (ops/moe_pallas.py).
                    # NEGATIVE RESULT, off by default: standalone it beats
                    # the XLA chain (169 vs 209 us/branch at the flagship
                    # shape) but END-TO-END the sampler is unchanged
                    # (19.44 vs 19.73 motions/s, within tunnel noise): the
                    # pallas_call fusion barrier re-materializes the branch
                    # LN output and un-fuses the downstream combine/LN
                    # chain, costing exactly the kernel's win. See
                    # BENCH_NOTES.md round-3 notes. Training always keeps
                    # the XLA path (autodiff backward beats reference-vjp).
                    from motiondiffusion_moe_tpu.ops.moe_pallas import (
                        moe_dense_fused)

                    out = moe_dense_fused(
                        x_flat.astype(self.dtype), combine_se, w1m,
                        b1.reshape(1, E * hid), w2.reshape(E * hid, D), b2)
                else:
                    h = (x_flat.astype(self.dtype) @ w1m).reshape(
                        S, E, hid) + b1[None, :, :]
                    h = nn.gelu(h)
                    h = h * combine_se[:, :, None]
                    out = h.reshape(S, E * hid) @ w2.reshape(E * hid, D) \
                        + combine_se @ b2
            else:
                # per-expert einsums keep E a contractable named dim that
                # the SPMD partitioner shards over the 'expert' mesh axis
                h = jnp.einsum("sd,edh->esh", x_flat.astype(self.dtype), w1) \
                    + b1[:, None, :]
                h = nn.gelu(h)
                y = jnp.einsum("esh,ehd->esd", h, w2) + b2[:, None, :]
                out = jnp.einsum("esd,se->sd", y, combine_se)
        elif self.compute == "dispatch":
            mesh = self.mesh
            ep = mesh.shape.get("expert", 1) if mesh is not None else 1
            if ep > 1:
                # explicit shard_map all-to-all over the 'expert' axis
                # (composes with TP via the closing psum over 'model')
                from motiondiffusion_moe_tpu.parallel.moe_parallel import (
                    ep_moe_ffn_sharded)

                out = ep_moe_ffn_sharded(
                    x_flat.astype(self.dtype), gate_logits.astype(self.dtype),
                    w1, b1, w2, b2, mesh=mesh, top_k=self.top_k,
                    capacity_factor=self.capacity_factor, num_experts=E)
            else:
                out = _capacity_dispatch_ffn(
                    x_flat.astype(self.dtype), top_idx, top_vals,
                    w1, b1, w2, b2, capacity_factor=self.capacity_factor)
        else:
            raise ValueError(f"unknown moe compute mode: {self.compute}")

        return out.reshape(orig_shape)


def _capacity_dispatch_ffn(x: jnp.ndarray, top_idx: jnp.ndarray,
                           top_vals: jnp.ndarray, w1, b1, w2, b2,
                           *, capacity_factor: float) -> jnp.ndarray:
    """Static-shape capacity dispatch/combine.

    Builds [S, E, C] one-hot dispatch and weighted combine tensors; tokens
    beyond an expert's capacity C = ceil(k*S/E * cf / k) are dropped from
    that expert (their other assignment may still fire). This is the layout
    expert-parallel all-to-all shards over the 'expert' mesh axis.
    """
    S, D = x.shape
    E = w1.shape[0]
    k = top_idx.shape[1]
    capacity = max(1, int(-(-S * capacity_factor // E)))  # ceil

    dispatch = jnp.zeros((S, E, capacity), x.dtype)
    combine = jnp.zeros((S, E, capacity), x.dtype)
    # running per-expert fill count across the k choice slots
    fill = jnp.zeros((E,), jnp.int32)
    for j in range(k):
        mask_se = jax.nn.one_hot(top_idx[:, j], E, dtype=jnp.int32)  # [S, E]
        pos = jnp.cumsum(mask_se, axis=0) - 1 + fill[None, :]        # [S, E]
        within = (pos < capacity) & (mask_se > 0)
        pos_onehot = jax.nn.one_hot(pos, capacity, dtype=x.dtype)    # [S,E,C]
        d_j = pos_onehot * within[..., None].astype(x.dtype)
        dispatch = dispatch + d_j
        combine = combine + d_j * top_vals[:, j][:, None, None]
        fill = fill + jnp.sum(mask_se * within.astype(jnp.int32), axis=0)

    expert_in = jnp.einsum("sec,sd->ecd", dispatch, x)
    h = jnp.einsum("ecd,edh->ech", expert_in, w1) + b1[:, None, :]
    h = nn.gelu(h)
    y = jnp.einsum("ech,ehd->ecd", h, w2) + b2[:, None, :]
    return jnp.einsum("sec,ecd->sd", combine, y)


class MoEMultiBranchFFN(nn.Module):
    """N parallel [LayerNorm -> SwitchMoE -> Dropout] branches, averaged,
    with a stylization residual (``multi_branch.py:31-61``)."""

    latent_dim: int
    ffn_dim: int
    num_experts: int = 8
    num_branches: int = 2
    top_k: int = 2
    capacity_factor: float = 2.0
    dropout: float = 0.1
    time_embed_dim: int = 512
    moe_compute: str = "dense_fused"
    mesh: Optional[Mesh] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        from motiondiffusion_moe_tpu.models.embeddings import StylizationBlock

        out = 0.0
        for i in range(self.num_branches):
            h = layer_norm(self.dtype, name=f"branch_{i}_norm")(x)
            h = SwitchMoELayer(latent_dim=self.latent_dim,
                               hidden_dim=self.ffn_dim,
                               num_experts=self.num_experts,
                               top_k=self.top_k,
                               capacity_factor=self.capacity_factor,
                               compute=self.moe_compute,
                               mesh=self.mesh,
                               dtype=self.dtype,
                               name=f"branch_{i}_moe")(h, deterministic)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            out = out + h
        out = out / self.num_branches
        style = StylizationBlock(latent_dim=self.latent_dim,
                                 time_embed_dim=self.time_embed_dim,
                                 dropout=self.dropout, dtype=self.dtype,
                                 name="proj_out")(out, emb, deterministic)
        return x + style


class DenseFFN(nn.Module):
    """Dense multi-branch FFN for the no-MoE config
    (``multi_branch.py:5-29`` — the reference's ``MultiBranchFFN``)."""

    latent_dim: int
    ffn_dim: int
    num_branches: int = 2
    dropout: float = 0.1
    time_embed_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        from motiondiffusion_moe_tpu.models.embeddings import StylizationBlock

        out = 0.0
        for i in range(self.num_branches):
            h = layer_norm(self.dtype, name=f"branch_{i}_norm")(x)
            h = nn.Dense(self.ffn_dim, dtype=self.dtype,
                         name=f"branch_{i}_fc1")(h)
            h = nn.gelu(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = nn.Dense(self.latent_dim, dtype=self.dtype,
                         name=f"branch_{i}_fc2")(h)
            out = out + h
        out = out / self.num_branches
        style = StylizationBlock(latent_dim=self.latent_dim,
                                 time_embed_dim=self.time_embed_dim,
                                 dropout=self.dropout, dtype=self.dtype,
                                 name="proj_out")(out, emb, deterministic)
        return x + style
