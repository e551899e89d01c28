"""Expert-parallel MoE FFN with explicit all-to-all dispatch (shard_map).

The manual-collective counterpart of the XLA-SPMD expert sharding in
:mod:`mesh` (BASELINE.json north star: "top-k dispatch/combine via
all_to_all over ICI inside shard_map"). Layout:

- tokens sharded over BOTH mesh axes (each device holds S/(dp*ep) tokens);
- expert weights sharded over the 'expert' axis (E_local = E/ep each);
- per device: route local tokens (gate weights replicated), build the
  static-capacity dispatch tensor, all_to_all the per-expert token buffers
  over the 'expert' axis so each device receives ITS experts' tokens from
  every peer in its expert group, run the expert FFNs, all_to_all back,
  combine locally.

Numerically identical to the single-device capacity-dispatch path
(`SwitchMoELayer(compute="dispatch")`) when no token overflows capacity.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from motiondiffusion_moe_tpu.parallel.mesh import (
    DATA_AXIS,
    EXPERT_AXIS,
    MODEL_AXIS,
)


def _dispatch_combine_from_logits(x, logits, top_k: int, capacity: int,
                                  num_experts: int):
    """Dispatch/combine tensors for the local token shard from precomputed
    gate logits (routing is per-token, so per-shard top-k equals the global
    decision)."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_vals, top_idx = jax.lax.top_k(probs, top_k)
    top_vals = top_vals.astype(x.dtype)

    S = x.shape[0]
    dispatch = jnp.zeros((S, num_experts, capacity), x.dtype)
    combine = jnp.zeros((S, num_experts, capacity), x.dtype)
    fill = jnp.zeros((num_experts,), jnp.int32)
    for j in range(top_k):
        mask_se = jax.nn.one_hot(top_idx[:, j], num_experts, dtype=jnp.int32)
        pos = jnp.cumsum(mask_se, axis=0) - 1 + fill[None, :]
        within = (pos < capacity) & (mask_se > 0)
        onehot = jax.nn.one_hot(pos, capacity, dtype=x.dtype)
        d_j = onehot * within[..., None].astype(x.dtype)
        dispatch = dispatch + d_j
        combine = combine + d_j * top_vals[:, j][:, None, None]
        fill = fill + jnp.sum(mask_se * within.astype(jnp.int32), axis=0)
    return dispatch, combine


def _local_moe_math(x, gate_w, gate_b, top_k: int, capacity: int,
                    num_experts: int):
    """Routing + dispatch/combine tensors for the local token shard."""
    logits = x @ gate_w + gate_b
    return _dispatch_combine_from_logits(x, logits, top_k, capacity,
                                         num_experts)


def ep_moe_ffn(x: jnp.ndarray,
               gate_w: jnp.ndarray, gate_b: jnp.ndarray,
               w1: jnp.ndarray, b1: jnp.ndarray,
               w2: jnp.ndarray, b2: jnp.ndarray,
               *, top_k: int = 2, capacity_factor: float = 2.0,
               num_experts: int, expert_axis: str = EXPERT_AXIS
               ) -> jnp.ndarray:
    """Body to run under shard_map. ``x``: local tokens [S_loc, D]; ``w1``
    etc: LOCAL expert shards [E_local, ...]; gate params replicated."""
    ep = jax.lax.axis_size(expert_axis)
    e_local = w1.shape[0]
    assert e_local * ep == num_experts
    S_loc, D = x.shape
    capacity = max(1, int(-(-S_loc * capacity_factor // num_experts)))

    dispatch, combine = _local_moe_math(x, gate_w, gate_b, top_k, capacity,
                                        num_experts)

    # per-expert token buffers from local tokens: [E, C, D]
    expert_in = jnp.einsum("sec,sd->ecd", dispatch, x)
    # group by owner shard: [ep, E_local, C, D] -> a2a over expert axis
    expert_in = expert_in.reshape(ep, e_local, capacity, D)
    # after a2a: axis 0 becomes the SOURCE shard index; each device now
    # holds [ep, E_local, C, D] = its own experts' tokens from all peers
    expert_in = jax.lax.all_to_all(expert_in, expert_axis, split_axis=0,
                                   concat_axis=0, tiled=True)
    expert_in = expert_in.reshape(ep, e_local, capacity, D)
    # merge source shards into the slot dimension: [E_local, ep*C, D]
    expert_in = expert_in.transpose(1, 0, 2, 3).reshape(
        e_local, ep * capacity, D)

    h = jnp.einsum("ecd,edh->ech", expert_in, w1) + b1[:, None, :]
    h = jax.nn.gelu(h)
    y = jnp.einsum("ech,ehd->ecd", h, w2) + b2[:, None, :]

    # route results back: [E_local, ep, C, D] -> a2a -> [E, C, D] local
    y = y.reshape(e_local, ep, capacity, D).transpose(1, 0, 2, 3)
    y = y.reshape(ep, e_local, capacity, D)
    y = jax.lax.all_to_all(y, expert_axis, split_axis=0, concat_axis=0,
                           tiled=True)
    y = y.reshape(num_experts, capacity, D)
    return jnp.einsum("sec,ecd->sd", combine, y)


def make_ep_moe_layer(mesh: Mesh, num_experts: int, top_k: int = 2,
                      capacity_factor: float = 2.0):
    """Build a jitted (x, params) -> y expert-parallel MoE layer.

    ``x``: [S, D] sharded over (data, expert) jointly on dim 0;
    ``params``: dict with gate_w [D, E], gate_b [E], w1 [E, D, H],
    b1 [E, H], w2 [E, H, D], b2 [E, D]; expert tensors sharded over
    'expert' on dim 0, gate replicated.
    """
    fn = functools.partial(ep_moe_ffn, top_k=top_k,
                           capacity_factor=capacity_factor,
                           num_experts=num_experts)

    def wrapped(x, params):
        return jax.shard_map(
            lambda x_, gw, gb, w1, b1, w2, b2: fn(x_, gw, gb, w1, b1, w2, b2),
            mesh=mesh,
            in_specs=(P((DATA_AXIS, EXPERT_AXIS)), P(), P(),
                      P(EXPERT_AXIS), P(EXPERT_AXIS),
                      P(EXPERT_AXIS), P(EXPERT_AXIS)),
            out_specs=P((DATA_AXIS, EXPERT_AXIS)),
        )(x, params["gate_w"], params["gate_b"], params["w1"],
          params["b1"], params["w2"], params["b2"])

    return jax.jit(wrapped)


# ---------------------------------------------------------------------------
# the model-consumable entry: called from SwitchMoELayer(compute="dispatch")
# under a mesh, composing EP all-to-all with Megatron TP on the experts
# ---------------------------------------------------------------------------

def _ep_moe_body_from_logits(x, logits, w1, b1, w2, b2, *,
                             top_k: int, capacity_factor: float,
                             num_experts: int,
                             expert_axis: str = EXPERT_AXIS,
                             model_axis: str = MODEL_AXIS) -> jnp.ndarray:
    """shard_map body: EP all-to-all dispatch with TP'd experts.

    ``x`` [S_loc, D] + ``logits`` [S_loc, E] local token shards (sharded
    jointly over (data, expert)); ``w1`` [E_local, D, H_local] /
    ``w2`` [E_local, H_local, D] local expert shards (expert dim over
    'expert', hidden dim over 'model'); ``b2`` replicated. The second
    matmul contracts the model-sharded hidden dim, closed by a psum over
    'model' (no-op at TP=1).
    """
    ep = jax.lax.axis_size(expert_axis)
    e_local = w1.shape[0]
    assert e_local * ep == num_experts
    S_loc, D = x.shape
    capacity = max(1, int(-(-S_loc * capacity_factor // num_experts)))

    dispatch, combine = _dispatch_combine_from_logits(
        x, logits, top_k, capacity, num_experts)

    expert_in = jnp.einsum("sec,sd->ecd", dispatch, x)
    expert_in = expert_in.reshape(ep, e_local, capacity, D)
    expert_in = jax.lax.all_to_all(expert_in, expert_axis, split_axis=0,
                                   concat_axis=0, tiled=True)
    expert_in = expert_in.reshape(ep, e_local, capacity, D)
    expert_in = expert_in.transpose(1, 0, 2, 3).reshape(
        e_local, ep * capacity, D)

    # column-parallel first matmul (b1 sharded on H), row-parallel second
    h = jnp.einsum("ecd,edh->ech", expert_in, w1) + b1[:, None, :]
    h = jax.nn.gelu(h)
    y = jnp.einsum("ech,ehd->ecd", h, w2)
    y = jax.lax.psum(y, model_axis)
    y = y + b2[:, None, :]

    y = y.reshape(e_local, ep, capacity, D).transpose(1, 0, 2, 3)
    y = y.reshape(ep, e_local, capacity, D)
    y = jax.lax.all_to_all(y, expert_axis, split_axis=0, concat_axis=0,
                           tiled=True)
    y = y.reshape(num_experts, capacity, D)
    return jnp.einsum("sec,ecd->sd", combine, y)


def ep_moe_ffn_sharded(x_flat: jnp.ndarray, gate_logits: jnp.ndarray,
                       w1: jnp.ndarray, b1: jnp.ndarray,
                       w2: jnp.ndarray, b2: jnp.ndarray,
                       *, mesh: Mesh, top_k: int, capacity_factor: float,
                       num_experts: int) -> jnp.ndarray:
    """Expert-parallel MoE FFN over an explicit shard_map all-to-all — the
    BASELINE north-star dispatch layout ("top-k dispatch/combine via
    all_to_all over ICI inside shard_map"), callable from inside a jitted
    model. Gradients flow through shard_map (backward all-to-alls are
    inserted automatically).

    ``x_flat`` [S, D] global tokens, ``gate_logits`` [S, E] global routing
    logits (computed by the layer's gate so the param tree is unchanged);
    weights in the [E, ...] global layout the DP x EP x TP sharding rules
    place over ('expert', 'model').
    """
    ep = mesh.shape.get(EXPERT_AXIS, 1)
    tp = mesh.shape.get(MODEL_AXIS, 1)
    dp = mesh.shape.get(DATA_AXIS, 1)
    S = x_flat.shape[0]
    if S % (dp * ep) != 0:
        raise ValueError(
            f"token count {S} not divisible by data*expert = {dp * ep}; "
            "pad the batch or reduce the expert-parallel degree")
    assert num_experts % ep == 0, (num_experts, ep)
    assert w1.shape[2] % tp == 0, (w1.shape, tp)

    body = functools.partial(
        _ep_moe_body_from_logits, top_k=top_k,
        capacity_factor=capacity_factor, num_experts=num_experts)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P((DATA_AXIS, EXPERT_AXIS)),      # x
                  P((DATA_AXIS, EXPERT_AXIS)),      # logits
                  P(EXPERT_AXIS, None, MODEL_AXIS),  # w1 [E, D, H]
                  P(EXPERT_AXIS, MODEL_AXIS),        # b1 [E, H]
                  P(EXPERT_AXIS, MODEL_AXIS, None),  # w2 [E, H, D]
                  P(EXPERT_AXIS)),                   # b2 [E, D]
        out_specs=P((DATA_AXIS, EXPERT_AXIS)),
    )(x_flat, gate_logits, w1, b1, w2, b2)
