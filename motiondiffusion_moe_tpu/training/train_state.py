"""Train state and the jitted train step.

Capability match of the reference's optimization recipe
(``trainers/ddpm_trainer.py:228-244,291-362``): Adam at ``lr``, global-norm
gradient clip 1.0, masked eps-MSE plus the MoE balance term, with the
second unconditional pass per batch (``:319-333``) and/or classic caption
dropout. TPU-first: forward+backward+update is ONE jitted function; the
(cond, uncond) double step is two invocations of the same compiled
function with different text ids (identical shapes -> no recompile).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from motiondiffusion_moe_tpu.config import ExperimentConfig
from motiondiffusion_moe_tpu.diffusion.gaussian import (
    DiffusionSchedule,
    LossType,
    ModelMeanType,
    ModelVarType,
    pred_xstart_from_eps,
    q_sample,
    training_loss_terms,
)
from motiondiffusion_moe_tpu.models.transformer import (
    MotionTransformer,
    generate_src_mask,
    sum_moe_aux_losses,
)
from motiondiffusion_moe_tpu.training import losses as L


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # EMA of the trained weights (TrainConfig.ema_decay > 0), else None.
    # Holds ONLY the 'params' collection ({"params": <tree>}): the sown
    # aux collections riding in `params` are per-step scalars that EMA
    # would average meaninglessly. None is an empty pytree, so states
    # saved before this field existed restore unchanged when EMA is off.
    ema_params: Any = None

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


# Leaves below this element count are concatenated into ONE flat vector
# for the global-norm reduction. The flagship tree has 1,860 leaves of
# which 1,396 are < 2^18 elements yet hold only 26 MB of the 1.45 GB —
# per-leaf square-reduces pay a fixed per-op cost that dominated the
# clip's device time (measured 5.9 ms vs the 1.7 ms read roofline).
# Grouping cuts the reduce count to ~470 at a ~52 MB copy cost.
_NORM_GROUP_MAX_ELEMS = 262144


def grouped_global_norm(tree, small_leaf_elems: int = _NORM_GROUP_MAX_ELEMS):
    """``optax.global_norm`` with small leaves concatenated into one reduce.

    Numerically equal up to float reassociation (different reduction
    order over the same squares); see ``tests/test_training.py``.
    """
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "size") and l.size]
    small = [l.astype(jnp.float32).ravel() for l in leaves
             if l.size < small_leaf_elems]
    big = [l for l in leaves if l.size >= small_leaf_elems]
    parts = [jnp.sum(jnp.square(jnp.concatenate(small)))] if small else []
    parts += [jnp.sum(jnp.square(l.astype(jnp.float32))) for l in big]
    return jnp.sqrt(jnp.sum(jnp.stack(parts)))


def clip_by_grouped_global_norm(
        max_norm: float,
        small_leaf_elems: int = _NORM_GROUP_MAX_ELEMS,
) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` semantics with the grouped norm."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        g_norm = grouped_global_norm(updates, small_leaf_elems)
        trigger = jnp.squeeze(g_norm < max_norm)

        def clip(t):
            return jax.lax.select(trigger, t,
                                  (t / g_norm.astype(t.dtype)) * max_norm)

        return jax.tree_util.tree_map(clip, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


class ScaleByAdamCompactState(NamedTuple):
    count: jax.Array
    mu: Any
    nu: Any


def scale_by_adam_compact(b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8,
                          mu_dtype=None, nu_dtype=None
                          ) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with BOTH moment storage dtypes selectable.

    optax exposes only ``mu_dtype``; the second moment is the same HBM
    mass and the flagship Adam update runs at the f32 read roofline
    (BENCH_NOTES.md second training pass). Moments are accumulated in
    f32 and stored rounded; with both dtypes None this matches
    ``optax.scale_by_adam`` (parity-tested)."""

    def cast(x, dtype):
        return x.astype(dtype) if dtype is not None else x

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return ScaleByAdamCompactState(jnp.zeros([], jnp.int32), mu, nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: cast(b1 * m.astype(g.dtype) + (1 - b1) * g,
                              mu_dtype),
            state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: cast(b2 * v.astype(g.dtype)
                              + (1 - b2) * jnp.square(g), nu_dtype),
            state.nu, updates)
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, g, v: ((m.astype(g.dtype) / c1)
                             / (jnp.sqrt(v.astype(g.dtype) / c2) + eps)),
            mu, updates, nu)
        return out, ScaleByAdamCompactState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_lr(cfg: ExperimentConfig):
    """The learning rate — a float (the reference's fixed Adam lr) or an
    optax schedule when warmup/cosine is configured."""
    tc = cfg.train
    if tc.lr_schedule == "cosine":
        if tc.lr_decay_steps <= 0:
            raise ValueError("lr_schedule='cosine' needs lr_decay_steps "
                             "(total steps incl. warmup)")
        return optax.warmup_cosine_decay_schedule(
            0.0, tc.lr, tc.lr_warmup_steps, tc.lr_decay_steps)
    if tc.lr_schedule != "constant":
        raise ValueError(f"unknown lr_schedule {tc.lr_schedule!r} "
                         "(constant | cosine)")
    if tc.lr_warmup_steps > 0:
        return optax.join_schedules(
            [optax.linear_schedule(0.0, tc.lr, tc.lr_warmup_steps),
             optax.constant_schedule(tc.lr)],
            [tc.lr_warmup_steps])
    return tc.lr


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    """clip_by_global_norm(1.0) -> Adam(lr) (``ddpm_trainer.py:241,298``)."""
    mu_dtype = (jnp.bfloat16 if cfg.train.adam_mu_dtype == "bfloat16"
                else None)
    lr = make_lr(cfg)
    if cfg.train.adam_nu_dtype == "bfloat16":
        adam = optax.chain(
            scale_by_adam_compact(mu_dtype=mu_dtype, nu_dtype=jnp.bfloat16),
            optax.scale_by_learning_rate(lr),
        )
    else:
        adam = optax.adam(lr, mu_dtype=mu_dtype)
    # GRAD_CLIP_IMPL=plain: measurement knob (read at trace time, like
    # LN_BF16_STATS) that swaps in optax's per-leaf clip so the grouped
    # form's device-time win can be A/B'd on chip; never a config surface.
    import os
    if os.environ.get("GRAD_CLIP_IMPL", "grouped") == "plain":
        clip = optax.clip_by_global_norm(cfg.train.grad_clip_norm)
    else:
        clip = clip_by_grouped_global_norm(cfg.train.grad_clip_norm)
    return optax.chain(clip, adam)


def create_train_state(model: MotionTransformer, cfg: ExperimentConfig,
                       rng: jax.Array, init_on_cpu: bool = True) -> TrainState:
    """Initialize params and the optimizer state.

    Param init compiles and runs on the host CPU backend by default, then
    transfers to the accelerator — compiling the init program for a large
    model through a remote TPU is pathologically slow (~7 min for the 363M
    flagship vs seconds on CPU), and init runs exactly once.
    """
    mc = cfg.model
    x = jnp.zeros((1, mc.max_frames, mc.input_feats))
    t = jnp.zeros((1,), jnp.int32)
    length = jnp.full((1,), mc.max_frames, jnp.int32)
    ids = jnp.zeros((1, mc.text_max_tokens), jnp.int32)

    def init(key):
        return model.init({"params": key}, x, t, length, text_ids=ids)

    default_device = jax.devices()[0]
    if init_on_cpu and default_device.platform != "cpu":
        # EAGER on CPU: flax init traces the whole forward, and jit-compiling
        # that graph takes minutes (XLA CPU ~6 min for the flagship; remote
        # TPU ~7 min); eager op-by-op execution needs no compile.
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = init(rng)
        variables = jax.device_put(variables, default_device)
    else:
        variables = jax.jit(init)(rng)
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables,
                      opt_state=tx.init(variables),
                      tx=tx,
                      # EMA starts as a COPY of the init weights (the
                      # guided-diffusion convention — no bias correction).
                      # A real copy, not an alias: the donated train step
                      # may not receive the same buffer twice.
                      ema_params=({"params": jax.tree_util.tree_map(
                                      jnp.copy, variables["params"])}
                                  if cfg.train.ema_decay > 0 else None))


def select_params(state: TrainState, use_ema: bool = False) -> Any:
    """The weights to SAMPLE with: raw params, or the EMA weights when
    ``use_ema`` (requires a run trained with ``ema_decay > 0``)."""
    if not use_ema:
        return state.params
    if state.ema_params is None:
        raise ValueError(
            "this run has no EMA weights (trained with ema_decay=0); "
            "drop --use_ema or retrain with --ema_decay")
    # a full variables dict (non-param collections from the live state,
    # 'params' from the EMA) so callers treat it exactly like .params
    return {**state.params, "params": state.ema_params["params"]}


def make_train_step(model: MotionTransformer, sched: DiffusionSchedule,
                    cfg: ExperimentConfig,
                    normalizer_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                    jit: bool = True,
                    ) -> Callable:
    """Build the jitted train step.

    Batch dict: ``motion`` [B,T,D] (normalized), ``length`` [B],
    ``text_ids`` [B,N], ``t`` [B] (schedule-sampler output), ``t_weight``
    [B] (importance weights; all-ones for uniform). With
    ``train.grad_accum_steps = A > 1`` every leaf instead carries a leading
    microbatch axis ([A, B/A, ...], host-chunked — see ``Trainer._chunk``)
    and the step performs ONE optimizer update from the A averaged
    microbatch gradients.
    Returns ``(new_state, metrics)`` where metrics includes the per-sample
    frame-MSE means needed to update loss-aware samplers host-side.
    """
    dc = cfg.diffusion
    tc = cfg.train
    mean_type = ModelMeanType(dc.model_mean_type)
    var_type = ModelVarType(dc.model_var_type)
    loss_type = LossType(dc.loss_type)
    use_advanced = (tc.w_velocity > 0 or tc.w_acceleration > 0
                    or tc.w_structure > 0 or tc.w_progressive > 0)
    if normalizer_stats is not None:
        norm_mean = jnp.asarray(normalizer_stats[0])
        norm_std = jnp.asarray(normalizer_stats[1])
    else:
        norm_mean = norm_std = None

    def loss_fn(params, batch, rng):
        noise_key, drop_key, depth_key = jax.random.split(rng, 3)
        x_start = batch["motion"]
        t = batch["t"]
        noise = jax.random.normal(noise_key, x_start.shape, x_start.dtype)
        x_t = q_sample(sched, x_start, t, noise)

        # pass ONLY the params collection: TrainState.params carries the
        # full init() output, whose stale init-time sown collections would
        # otherwise ride into `cols` and double-count any aux value the
        # current path sows under a different name (e.g. the pipeline
        # ring's pp_aux_* vs the stacked scan's per-layer entries)
        model_out, cols = model.apply(
            {"params": params["params"]}, x_t, t, batch["length"],
            text_ids=batch["text_ids"],
            deterministic=False,
            rngs={"dropout": drop_key, "stochdepth": depth_key},
            mutable=["moe_losses", "moe_metrics"])

        terms = training_loss_terms(sched, model_out, x_start, x_t, t, noise,
                                    mean_type=mean_type, var_type=var_type,
                                    loss_type=loss_type)
        src_mask = generate_src_mask(x_start.shape[1], batch["length"])
        # t_weight: schedule-sampler importance weights (all-ones under the
        # uniform sampler -> exact reference loss). Applied here so
        # loss-second-moment/adaptive samplers stay unbiased; the advanced
        # losses below are our own additions and stay unweighted.
        loss_rec = L.masked_frame_mse(terms["pred"], terms["target"], src_mask,
                                      sample_weight=batch.get("t_weight"))

        moe_loss = sum_moe_aux_losses(cols) * cfg.model.moe_aux_loss_weight
        total = loss_rec + moe_loss
        metrics = {"loss_mot_rec": loss_rec, "loss_moe": moe_loss}

        if use_advanced:
            if mean_type == ModelMeanType.EPSILON:
                pred_x0 = pred_xstart_from_eps(sched, x_t, t, terms["pred"])
            else:
                pred_x0 = terms["pred"]
            if tc.w_velocity > 0:
                lv = L.velocity_loss(pred_x0, x_start, src_mask)
                total = total + tc.w_velocity * lv
                metrics["loss_velocity"] = lv
            if tc.w_acceleration > 0:
                la = L.acceleration_loss(pred_x0, x_start, src_mask)
                total = total + tc.w_acceleration * la
                metrics["loss_acceleration"] = la
            if tc.w_progressive > 0:
                lp = L.progressive_loss(pred_x0, x_start, src_mask)
                total = total + tc.w_progressive * lp
                metrics["loss_progressive"] = lp
            if tc.w_structure > 0:
                assert norm_mean is not None, \
                    "structure loss needs normalizer stats (joint-space decode)"
                pd = pred_x0 * norm_std + norm_mean
                td = x_start * norm_std + norm_mean
                ls = L.structure_loss(pd, td, src_mask, cfg.data.num_joints)
                total = total + tc.w_structure * ls
                metrics["loss_structure"] = ls

        metrics["loss_total"] = total
        # per-sample masked mse (for loss-aware schedule samplers)
        per_frame = jnp.mean((terms["pred"] - terms["target"]) ** 2, axis=-1)
        per_sample = (jnp.sum(per_frame * src_mask, axis=1)
                      / jnp.maximum(jnp.sum(src_mask, axis=1), 1.0))
        metrics["per_sample_mse"] = per_sample
        return total, metrics

    def apply_update(state: TrainState, grads, metrics):
        # same graph as the clip's norm -> XLA CSEs it away to zero cost
        # (must match the clip impl chosen in make_optimizer, or the A/B
        # knob would pay BOTH norm graphs)
        import os
        if os.environ.get("GRAD_CLIP_IMPL", "grouped") == "plain":
            metrics["grad_norm"] = optax.global_norm(grads)
        else:
            metrics["grad_norm"] = grouped_global_norm(grads)
        new_state = state.apply_gradients(grads)
        if tc.ema_decay > 0:
            d = tc.ema_decay
            new_state = new_state.replace(ema_params={
                "params": jax.tree_util.tree_map(
                    lambda e, p: d * e + (1.0 - d) * p,
                    state.ema_params["params"],
                    new_state.params["params"])})
        return new_state, metrics

    accum = max(1, tc.grad_accum_steps)

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        return apply_update(state, grads, metrics)

    def accum_train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                         rng: jax.Array):
        """One optimizer update from ``accum`` sequential microbatches.

        ``batch`` leaves carry a leading [A, B/A, ...] microbatch axis
        (host-chunked by the Trainer so the batch axis stays data-sharded
        within each chunk — an in-graph reshape of a sharded axis would
        re-sort the samples across devices). Grads are averaged in the
        params' dtype (f32); each microbatch draws its own rng key, so
        noise/dropout are decorrelated across chunks.
        """
        keys = jax.random.split(rng, accum)

        def body(g_acc, xs):
            chunk, key = xs
            (_, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, chunk, key)
            g_acc = jax.tree_util.tree_map(
                lambda a, b: a + b / accum, g_acc, g)
            return g_acc, m

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        grads, stacked = jax.lax.scan(body, zeros, (batch, keys))
        metrics = {}
        for k, v in stacked.items():
            if k == "per_sample_mse":
                # [A, B/A] -> [B], the exact inverse of the host chunking,
                # so loss-aware samplers see per-sample losses in the
                # original batch order
                metrics[k] = v.reshape(-1)
            else:
                metrics[k] = jnp.mean(v, axis=0)
        return apply_update(state, grads, metrics)

    if accum > 1:
        train_step = accum_train_step

    if not jit:
        # raw fn for callers that apply their own jit + shardings
        # (parallel.make_sharded_train_step)
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_multi_train_step(model: MotionTransformer, sched: DiffusionSchedule,
                          cfg: ExperimentConfig,
                          normalizer_stats=None, jit: bool = True,
                          ) -> Callable:
    """K train steps as ONE compiled program (``lax.scan`` over stacked
    batches) — the production inner loop.

    Each host->device dispatch pays a fixed control-plane cost (tens of ms
    through a remote-chip tunnel, ~10 us locally but still per-step host
    work); scanning K steps device-side amortizes it to 1/K and lets the
    device run back-to-back steps with no host round-trip. The reference
    steps its Python loop once per optimizer update
    (``trainers/ddpm_trainer.py:313-352``).

    Signature: ``(state, batches, rng) -> (state, metrics)`` where every
    leaf of ``batches`` carries a leading ``[K, ...]`` axis (K static) and
    ``metrics`` are stacked ``[K]`` per-step. RNG is split per step from
    the single key.
    """
    step = make_train_step(model, sched, cfg,
                           normalizer_stats=normalizer_stats, jit=False)

    def multi_step(state: TrainState, batches: Dict[str, jnp.ndarray],
                   rng: jax.Array):
        def body(carry, batch):
            state, rng = carry
            rng, k = jax.random.split(rng)
            state, metrics = step(state, batch, k)
            return (state, rng), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), batches)
        return state, metrics

    if not jit:
        return multi_step
    return jax.jit(multi_step, donate_argnums=(0,))
