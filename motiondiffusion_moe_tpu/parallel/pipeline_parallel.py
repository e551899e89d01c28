"""Pipeline parallelism: GPipe microbatch ring over the 'pipe' mesh axis.

The reference has no pipeline parallelism (its only distribution is DDP,
``tools/train.py:95-145``; SURVEY.md §2.4 row PP). This is the TPU-native
construction for when the decoder stack outgrows one chip: the
``scan_blocks=True`` stacked [L, ...] block parameters are sharded into
contiguous stages over 'pipe' (L/S consecutive blocks per device), the
batch is split into M microbatches, and hidden-state activations circulate
stage -> stage with ``lax.ppermute`` over ICI inside a ``shard_map``. Only
the hidden state rides the ring; per-microbatch conditioning (text tokens,
fused embedding, masks) is read locally from the already-present
microbatch buffer. The schedule is plain GPipe: M + S - 1 ticks, bubble
fraction (S-1)/(M+S-1).

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

KNOWN APPROXIMATION: the MoE Switch aux loss is a product of per-batch
means (``moe.py: switch_aux_loss``), so averaging it over M microbatches
— and, under DP x PP, pmean-ing the per-data-shard values (a mean of
products, where the SPMD paths compute the product of global means) — is
not bit-equal to the full-batch value (the denoiser OUTPUT is bit-equal;
only this auxiliary load-balancing term differs). Same class of
approximation every microbatched trainer makes; documented here and in
the README.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from motiondiffusion_moe_tpu.parallel.mesh import DATA_AXIS, PIPE_AXIS

# stage_fn(stage_params, ring, context_mb, stage_xs, mb_index)
#   -> (ring, aux)
StageFn = Callable[..., Tuple[Any, jnp.ndarray]]


def pp_num_microbatches(pipeline_microbatches: int, pp: int) -> int:
    """The microbatch count M the GPipe path actually uses
    (``transformer._run_blocks_pp``): the config value, defaulting to
    2*S (bubble fraction (S-1)/(M+S-1) = ~33% at M=2S)."""
    return pipeline_microbatches or 2 * pp


def validate_pp_layout(mesh: Mesh, num_layers: int, batch: int,
                       pipeline_microbatches: int,
                       batch_desc: str = "global batch",
                       fix_hint: str = "") -> None:
    """Raise early (at Trainer/GenerationPipeline construction) when a PP
    config cannot satisfy the GPipe ring's static layout, instead of the
    opaque shard_map error the first jitted step would produce. The single
    source of truth for the preconditions ``gpipe`` + the stacked [L, ...]
    param sharding impose: L % S == 0, B % M == 0, (B/M) % dp == 0."""
    pp = mesh.shape.get(PIPE_AXIS, 1)
    if pp <= 1:
        return
    dp = mesh.shape.get(DATA_AXIS, 1)
    M = pp_num_microbatches(pipeline_microbatches, pp)
    if num_layers % pp != 0:
        raise ValueError(
            f"pipeline parallelism: num_layers={num_layers} must be "
            f"divisible by the '{PIPE_AXIS}' mesh axis ({pp}) — stacked "
            f"[L, ...] block params shard into contiguous stages"
            f"{fix_hint}")
    if batch % M != 0 or (batch // M) % dp != 0:
        raise ValueError(
            f"pipeline parallelism: {batch_desc} ({batch}) must split "
            f"into pipeline_microbatches={M} microbatches whose size "
            f"divides the '{DATA_AXIS}' mesh axis ({dp}){fix_hint}")


def gpipe(stage_fn: StageFn, stacked_params: Any, ring: Any, context: Any,
          mesh: Mesh, num_microbatches: int,
          per_layer_xs: Any = ()) -> Tuple[Any, jnp.ndarray]:
    """Run ``stage_fn`` through an S-stage GPipe ring.

    - ``stacked_params``: pytree with a leading [L] layer axis on every
      leaf (the ``scan_blocks`` layout), L divisible by
      S = mesh.shape['pipe']; sharded into contiguous stages.
    - ``ring``: pytree of [B, ...] arrays that circulate stage -> stage
      (the hidden state). B divisible by ``num_microbatches`` (and each
      microbatch by the 'data' axis).
    - ``context``: pytree of [B, ...] arrays the blocks read but never
      write (conditioning); microbatched and read locally per tick — NOT
      circulated.
    - ``per_layer_xs``: pytree with a leading [L] axis (stochastic-depth
      coins, survival probs, per-layer rng keys), sliced to the local
      stage.

    Returns ``(ring_out, aux)``: the ring after all L blocks in order,
    and ``stage_fn``'s scalar aux summed over all real (non-bubble)
    stage x microbatch computations, averaged over microbatches and over
    the 'data' axis — the PP estimate of the full-batch MoE aux loss
    (see module docstring for the microbatching approximation).
    """
    S = mesh.shape[PIPE_AXIS]
    M = num_microbatches
    B = jax.tree_util.tree_leaves(ring)[0].shape[0]
    assert B % M == 0, f"batch {B} not divisible by microbatches {M}"

    as_mb = lambda a: a.reshape(M, B // M, *a.shape[1:])  # noqa: E731
    ring_mb = jax.tree.map(as_mb, ring)
    ctx_mb = jax.tree.map(as_mb, context)

    def body(params_local, xs_local, ring_local, ctx_local):
        r = jax.lax.axis_index(PIPE_AXIS)
        # seed the ring with REAL data (microbatch 0), not zeros: bubble
        # computations are discarded, but their grads still flow as
        # 0-cotangent chains — and a zero hidden state hits d||x||/dx at
        # x=0 (NaN), which 0 * NaN would propagate into the param grads
        state = jax.tree.map(lambda a: a[0], ring_local)
        outs = jax.tree.map(jnp.zeros_like, ring_local)

        def tick(carry, t):
            state, outs, aux_sum = carry
            # stage r works on microbatch m = t - r (clipped in bubbles)
            m = jnp.clip(t - r, 0, M - 1)
            fresh = jax.tree.map(lambda a: a[jnp.clip(t, 0, M - 1)],
                                 ring_local)
            cur = jax.tree.map(lambda f, s: jnp.where(r == 0, f, s),
                               fresh, state)
            ctx = jax.tree.map(lambda a: a[m], ctx_local)
            y, aux = stage_fn(params_local, cur, ctx, xs_local, m)
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
        # after the stack runs replicated over 'pipe')
        outs = jax.tree.map(
            lambda o: jax.lax.psum(
                jnp.where(r == S - 1, o, jnp.zeros_like(o)), PIPE_AXIS),
            outs)
        # stage aux values live on different ranks (sum the ring) and each
        # data shard saw only its local tokens (mean over 'data'; for the
        # nonlinear Switch aux this is a mean of per-shard products — see
        # the module docstring's approximation note)
        aux_sum = jax.lax.psum(aux_sum, PIPE_AXIS)
        aux_sum = jax.lax.pmean(aux_sum, DATA_AXIS)
        return outs, aux_sum

    out_mb, aux = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(PIPE_AXIS), P(PIPE_AXIS),
                  P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=(P(None, DATA_AXIS), P()),
        check_vma=False,
    )(stacked_params, per_layer_xs, ring_mb, ctx_mb)
    out = jax.tree.map(lambda a: a.reshape(B, *a.shape[2:]), out_mb)
    return out, aux / M


def make_block_stage_fn(block_template, deterministic: bool,
                        remat_policy: str = "") -> StageFn:
    """StageFn running this stage's slice of decoder blocks sequentially.

    ``block_template``: an UNBOUND ``MoEDecoderLayer`` (from
    ``models.transformer._block_kwargs``), applied functionally per layer
    with ``{"params": layer_params}``. Ring: ``{"h": hidden}``; context:
    ``xf``, ``emb``, ``src_mask`` read per microbatch.

    ``remat_policy``: ModelConfig.remat_blocks name — wraps each block
    apply in ``jax.checkpoint`` so the PP backward recomputes per the same
    policy as the non-PP layouts (otherwise every tick's intermediates are
    stored — exactly the memory PP exists to save).

    Per-layer xs — deterministic: ``(survival,)``; training:
    ``(survival, coins, keys)``:
    - ``survival`` [L] float — survival probs (p >= 1 disables the drop),
    - ``coins`` [L] bool — the whole-batch stochastic-depth coin per block
      (reference ``time.py:41-48``: ONE coin per block per forward, shared
      by every microbatch),
    - ``keys`` [L, M] rng keys for block dropout (per layer x microbatch).

    Sown MoE aux losses are summed into the scalar aux output; expert
    metrics are discarded in the PP path.
    """
    from motiondiffusion_moe_tpu.models.transformer import (
        _remat_policy, sum_moe_aux_losses)

    def _apply_det(p_layer, h, xf, emb, src_mask):
        return block_template.apply(
            {"params": p_layer}, h, xf, emb, src_mask, True,
            mutable=["moe_losses", "moe_metrics"])

    def _apply_train(p_layer, h, xf, emb, src_mask, key):
        # decorrelate dropout across data shards: the [L, M] keys are
        # generated outside the shard_map, so without this fold every
        # data shard would draw the SAME mask pattern (the SPMD paths
        # draw one mask over the global batch instead)
        key = jax.random.fold_in(key, jax.lax.axis_index(DATA_AXIS))
        return block_template.apply(
            {"params": p_layer}, h, xf, emb, src_mask, False,
            rngs={"dropout": key},
            mutable=["moe_losses", "moe_metrics"])

    apply_det, apply_train = _apply_det, _apply_train
    if remat_policy:
        policy = _remat_policy(remat_policy)
        apply_det = jax.checkpoint(_apply_det, policy=policy)
        apply_train = jax.checkpoint(_apply_train, policy=policy)

    def stage_fn(params_local, ring, ctx, xs_local, m):
        def one_layer(carry, layer):
            h, aux = carry
            if deterministic:
                p_layer, _ = layer
                out, cols = apply_det(p_layer, h, ctx["xf"], ctx["emb"],
                                      ctx["src_mask"])
            else:
                p_layer, (surv, keep, key_row) = layer
                out, cols = apply_train(p_layer, h, ctx["xf"], ctx["emb"],
                                        ctx["src_mask"], key_row[m])
                # branchless stochastic depth (no-op when p>=1 or kept)
                out = jnp.where(jnp.logical_or(keep, surv >= 1.0), out, h)
            aux = aux + sum_moe_aux_losses(cols)
            return (out, aux), None

        (h, aux), _ = jax.lax.scan(
            one_layer, (ring["h"], jnp.zeros((), jnp.float32)),
            (params_local, xs_local))
        return dict(ring, h=h), aux

    return stage_fn


# ---------------------------------------------------------------------------
# Per-stage memory accounting
# ---------------------------------------------------------------------------

def pp_stage_memory_report(params, num_stages: int, *,
                           train: bool = True, ema: bool = False,
                           batch: int = 0, num_microbatches: int = 0,
                           max_frames: int = 0, latent_dim: int = 0,
                           hbm_bytes: int = 16 * 2**30) -> dict:
    """Analytical per-stage memory accounting for an S-stage GPipe run.

    The reference never needed this (single-GPU DDP only); it is the
    sizing tool for the one regime PP exists for — a decoder stack whose
    TRAIN state outgrows one chip's HBM (SURVEY.md §2.4 PP row).

    ``params``: the model's variables pytree (concrete arrays or
    ``jax.eval_shape`` structs — only ``.shape``/``.dtype`` are read).
    Block leaves (path contains ``blocks_low``/``blocks_high``, the
    stacked [L, ...] layout) shard into S contiguous stages; everything
    else is replicated on every pipe rank.

    Returns a dict with per-stage byte totals and ``min_stages_to_fit``:
    the smallest S (1, 2, 4, ...) whose per-stage train state fits
    ``hbm_bytes`` (default: one v5e chip's 16 GB). Optimizer multiplier:
    params + grads + Adam mu + nu (+ EMA) in the param dtype.
    """
    import numpy as np  # shapes only — no device math

    def nbytes(leaf):
        return int(np.prod(leaf.shape)) * np.dtype(leaf.dtype).itemsize

    flat = jax.tree_util.tree_leaves_with_path(params)
    block_b = other_b = 0
    for path, leaf in flat:
        key = jax.tree_util.keystr(path)
        if "blocks_low" in key or "blocks_high" in key:
            block_b += nbytes(leaf)
        else:
            other_b += nbytes(leaf)

    mult = (5 if ema else 4) if train else 1  # p + g + mu + nu (+ ema)

    def stage_bytes(S):
        return (block_b // S + other_b) * mult

    report = {
        "num_stages": num_stages,
        "param_bytes_total": block_b + other_b,
        "param_bytes_blocks": block_b,
        "param_bytes_replicated": other_b,
        "state_multiplier": mult,
        "stage_state_bytes": stage_bytes(num_stages),
        "single_device_state_bytes": stage_bytes(1),
        "hbm_bytes": hbm_bytes,
    }
    S = 1
    while stage_bytes(S) > hbm_bytes and S < 4096:
        S *= 2
    report["min_stages_to_fit"] = S
    if batch and num_microbatches and max_frames and latent_dim:
        mb = batch // num_microbatches
        # the ring carries ONE microbatch's hidden state per tick; the
        # GPipe scan additionally stores each real tick's ring output for
        # the backward (M + S - 1 ticks, valid ticks ~M)
        ring = mb * max_frames * latent_dim * 4
        report["ring_bytes_per_tick"] = ring
        report["ring_bytes_backward"] = ring * (num_microbatches
                                                + num_stages - 1)
    return report


def format_pp_memory_report(report: dict) -> str:
    g = 2.0**30
    lines = [
        f"PP-{report['num_stages']} stage memory accounting "
        f"(x{report['state_multiplier']} train-state multiplier):",
        f"  params total        {report['param_bytes_total'] / g:8.2f} GiB"
        f"  (blocks {report['param_bytes_blocks'] / g:.2f}, replicated "
        f"{report['param_bytes_replicated'] / g:.2f})",
        f"  train state / chip  {report['single_device_state_bytes'] / g:8.2f}"
        f" GiB unsharded vs {report['stage_state_bytes'] / g:.2f} GiB/stage "
        f"at PP-{report['num_stages']}",
        f"  fits {report['hbm_bytes'] / g:.1f} GiB HBM from S = "
        f"{report['min_stages_to_fit']}",
    ]
    if "ring_bytes_per_tick" in report:
        lines.append(
            f"  ring activation     {report['ring_bytes_per_tick'] / g:8.3f}"
            f" GiB/tick, ~{report['ring_bytes_backward'] / g:.3f} GiB held "
            "for backward")
    return "\n".join(lines)
