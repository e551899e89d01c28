"""Pipeline parallelism: GPipe microbatch ring over the 'pipe' mesh axis.

The reference has no pipeline parallelism (its only distribution is DDP,
``tools/train.py:95-145``; SURVEY.md §2.4 row PP). This is the TPU-native
construction for when the decoder stack outgrows one chip: the
``scan_blocks=True`` stacked [L, ...] block parameters are sharded into
contiguous stages over 'pipe' (L/S consecutive blocks per device), the
batch is split into M microbatches, and activations circulate stage ->
stage with ``lax.ppermute`` over ICI inside a ``shard_map``. The schedule
is plain GPipe: M + S - 1 ticks, bubble fraction (S-1)/(M+S-1).

Composition: 'pipe' x 'data' (microbatches are additionally sharded over
'data' inside the body). EP/TP/SP do not compose with PP here — the body
is manual per-device code, so the SPMD partitioner cannot shard the block
einsums further inside it; at this model's size PP is an alternative to
those axes, not a complement (README "Parallelism"). The Pallas attention
kernels DO run inside the body (they are single-device programs — exactly
what a pipeline stage is).

Differentiable end-to-end: the transpose of ``ppermute`` is the reverse
ring and the transpose of the tick ``scan`` runs the schedule backwards,
so ``jax.grad`` of a pipelined loss IS backward pipelining.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from motiondiffusion_moe_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS

# stage_fn(stage_params, payload, stage_xs, mb_index) -> (payload, aux)
StageFn = Callable[[Any, Any, Any, jnp.ndarray], Tuple[Any, jnp.ndarray]]


def gpipe(stage_fn: StageFn, stacked_params: Any, payload: Any,
          mesh: Mesh, num_microbatches: int,
          per_layer_xs: Any = ()) -> Tuple[Any, jnp.ndarray]:
    """Run ``stage_fn`` through an S-stage GPipe ring.

    - ``stacked_params``: pytree with a leading [L] layer axis on every
      leaf (the ``scan_blocks`` layout), L divisible by
      S = mesh.shape['pipe']; sharded into contiguous stages.
    - ``payload``: pytree of [B, ...] arrays the blocks consume and
      produce (hidden state + per-example conditioning). B divisible by
      ``num_microbatches`` (and each microbatch by the 'data' axis).
    - ``per_layer_xs``: pytree with a leading [L] axis (stochastic-depth
      coins, survival probs, per-layer rng keys), handed to ``stage_fn``
      sliced to the local stage.

    Returns ``(payload_out, aux)``: the payload after all L blocks in
    order, and the sum of ``stage_fn``'s scalar aux over all real
    (non-bubble) stage x microbatch computations, averaged over
    microbatches — the PP equivalent of the full-batch MoE aux loss.
    """
    S = mesh.shape[PIPE_AXIS]
    M = num_microbatches
    B = jax.tree_util.tree_leaves(payload)[0].shape[0]
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"

    mb = jax.tree.map(lambda a: a.reshape(M, B // M, *a.shape[1:]), payload)

    def body(params_local, xs_local, mb_local):
        r = jax.lax.axis_index(PIPE_AXIS)
        # seed the ring with REAL data (microbatch 0), not zeros: bubble
        # computations are discarded, but their grads still flow as
        # 0-cotangent chains — and a zero hidden state hits d||x||/dx at
        # x=0 (NaN), which 0 * NaN would propagate into the param grads
        state = jax.tree.map(lambda a: a[0], mb_local)
        outs = jax.tree.map(jnp.zeros_like, mb_local)

        def tick(carry, t):
            state, outs, aux_sum = carry
            # stage r works on microbatch m = t - r (clipped during bubble)
            m = jnp.clip(t - r, 0, M - 1)
            fresh = jax.tree.map(lambda a: a[jnp.clip(t, 0, M - 1)],
                                 mb_local)
            cur = jax.tree.map(lambda f, s: jnp.where(r == 0, f, s),
                               fresh, state)
            y, aux = stage_fn(params_local, cur, xs_local, m)
            # real work iff r <= t < r + M (GPipe bubble elsewhere)
            valid = jnp.logical_and(r <= t, t < r + M)
            aux_sum = aux_sum + jnp.where(valid, aux, 0.0)
            # the last stage finishes microbatch t - (S-1) at tick t
            oidx = jnp.clip(t - (S - 1), 0, M - 1)
            done = jnp.logical_and(r == S - 1, t >= S - 1)
            outs = jax.tree.map(
                lambda o, yy: o.at[oidx].set(jnp.where(done, yy, o[oidx])),
                outs, y)
            perm = [(i, (i + 1) % S) for i in range(S)]
            state = jax.tree.map(
                lambda yy: jax.lax.ppermute(yy, PIPE_AXIS, perm), y)
            return (state, outs, aux_sum), None

        (_, outs, aux_sum), _ = jax.lax.scan(
            tick, (state, outs, jnp.zeros((), jnp.float32)),
            jnp.arange(M + S - 1))
        # replicate the last stage's outputs to every pipe rank (everything
        # after the stack runs replicated over 'pipe'); sum stage aux
        outs = jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(r == S - 1, o, jnp.zeros_like(o)), PIPE_AXIS),
            outs)
        aux_sum = jax.lax.psum(aux_sum, PIPE_AXIS)
        return outs, aux_sum

    out_mb, aux = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(PIPE_AXIS), P(None, DATA_AXIS)),
        out_specs=(P(None, DATA_AXIS), P()),
        check_vma=False,
    )(stacked_params, per_layer_xs, mb)
    out = jax.tree.map(lambda a: a.reshape(B, *a.shape[2:]), out_mb)
    return out, aux / M


def make_block_stage_fn(block_template, deterministic: bool) -> StageFn:
    """StageFn running this stage's slice of decoder blocks sequentially.

    ``block_template``: an UNBOUND ``MoEDecoderLayer`` (from
    ``models.transformer._block_kwargs``), applied functionally per layer
    with ``{"params": layer_params}``. Payload dict: ``h`` (hidden state)
    plus the conditioning ``xf``, ``emb``, ``src_mask`` every block reads
    unchanged.

    Per-layer xs — deterministic: ``(survival,)``; training:
    ``(survival, coins, keys)``:
    - ``survival`` [L] float — survival probs (p >= 1 disables the drop),
    - ``coins`` [L] bool — the whole-batch stochastic-depth coin per block
      (reference ``time.py:41-48``: ONE coin per block per forward, shared
      by every microbatch),
    - ``keys`` [L, M] rng keys for block dropout (folded per microbatch).

    Sown MoE aux losses are summed into the scalar aux output; expert
    metrics are discarded in the PP path.
    """
    from motiondiffusion_moe_tpu.models.transformer import (
        sum_moe_aux_losses)

    def stage_fn(params_local, payload, xs_local, m):
        def one_layer(carry, layer):
            h, aux = carry
            if deterministic:
                p_layer, _ = layer
                out, cols = block_template.apply(
                    {"params": p_layer}, h, payload["xf"], payload["emb"],
                    payload["src_mask"], True,
                    mutable=["moe_losses", "moe_metrics"])
            else:
                p_layer, (surv, keep, key_row) = layer
                out, cols = block_template.apply(
                    {"params": p_layer}, h, payload["xf"], payload["emb"],
                    payload["src_mask"], False,
                    rngs={"dropout": key_row[m]},
                    mutable=["moe_losses", "moe_metrics"])
                # branchless stochastic depth (no-op when p>=1 or kept)
                out = jnp.where(jnp.logical_or(keep, surv >= 1.0), out, h)
            aux = aux + sum_moe_aux_losses(cols)
            return (out, aux), None

        (h, aux), _ = jax.lax.scan(
            one_layer, (payload["h"], jnp.zeros((), jnp.float32)),
            (params_local, xs_local))
        return dict(payload, h=h), aux

    return stage_fn
