"""Jit-compiled sampling loops.

TPU-first redesign of the reference's Python sampling loops:

- ``p_sample_loop_with_cfg`` (``gaussian_diffusion.py:1100-1141``) runs 1000
  Python-dispatched iterations, each doing TWO sequential full model forwards
  (cond + uncond, re-encoding the empty-text prompt every step,
  ``:1058-1072``) — 2000 forwards per batch. Here the whole loop is ONE
  ``lax.scan`` whose body does a SINGLE doubled-batch forward: the caller
  bakes cond embeddings into the first half of the batch and the (computed
  once) uncond embeddings into the second half.
- ``ddim_sample_loop`` (``:699-818``) gains timestep respacing (absent in
  the reference; required for the 50-step DDIM benchmark config) via
  ``timestep_map`` from :mod:`respace`.

Guidance semantics match ``p_sample_with_cfg`` (``:1042-1098``): guidance in
x0-space, ``guided = x0_u + s*(x0_c - x0_u)``; posterior mean recomputed from
the guided x0; the conditional branch's variance is used for the noise term.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from motiondiffusion_moe_tpu.diffusion.gaussian import (
    DiffusionSchedule,
    ModelMeanType,
    ModelVarType,
    _extract,
    p_mean_variance,
    pred_eps_from_xstart,
    q_posterior_mean_variance,
)

# model_fn(x, t) -> model_output; conditioning is closed over by the caller.
ModelFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def cfg_model_fn(model_fn_doubled: ModelFn) -> Callable[[jnp.ndarray, jnp.ndarray],
                                                        Tuple[jnp.ndarray, jnp.ndarray]]:
    """Wrap a doubled-batch model into (cond_out, uncond_out).

    ``model_fn_doubled`` must accept a batch of 2B rows where rows [0, B)
    carry conditional text embeddings and rows [B, 2B) the unconditional
    (empty-text) embeddings — the single-forward CFG the reference's
    sequential two-forward scheme becomes on TPU.
    """

    def fn(x: jnp.ndarray, t: jnp.ndarray):
        b = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        out2 = model_fn_doubled(x2, t2)
        return out2[:b], out2[b:]

    return fn


def _map_t(timestep_map: Optional[jnp.ndarray], t: jnp.ndarray) -> jnp.ndarray:
    """Respaced step index -> original-scale timestep for model conditioning."""
    if timestep_map is None:
        return t
    # jnp.asarray: the map may be host numpy (a trace-time constant);
    # numpy can't be indexed with a traced t
    return jnp.asarray(timestep_map)[t]


def _nonzero_mask(t: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return (t != 0).astype(like.dtype).reshape((-1,) + (1,) * (like.ndim - 1))


def ddpm_step(sched: DiffusionSchedule, model_out: jnp.ndarray, x: jnp.ndarray,
              t: jnp.ndarray, z: jnp.ndarray, *,
              mean_type: ModelMeanType = ModelMeanType.EPSILON,
              var_type: ModelVarType = ModelVarType.FIXED_SMALL,
              clip_denoised: bool = False,
              cond_fn=None) -> jnp.ndarray:
    """One ancestral step x_t -> x_{t-1} given the model output and noise z.

    Mirrors ``p_sample`` (``gaussian_diffusion.py:582-614``): noise is masked
    out at t=0; optional classifier guidance via ``cond_fn`` (condition_mean,
    ``:607-610``).
    """
    out = p_mean_variance(sched, model_out, x, t, mean_type=mean_type,
                          var_type=var_type, clip_denoised=clip_denoised)
    if cond_fn is not None:
        from motiondiffusion_moe_tpu.diffusion.guidance import condition_mean

        out["mean"] = condition_mean(cond_fn, out, x, t)
    return out["mean"] + _nonzero_mask(t, x) * jnp.exp(0.5 * out["log_variance"]) * z


def ddpm_cfg_step(sched: DiffusionSchedule, out_c_raw: jnp.ndarray,
                  out_u_raw: jnp.ndarray, x: jnp.ndarray, t: jnp.ndarray,
                  z: jnp.ndarray, *, guidance_scale: float = 7.5,
                  mean_type: ModelMeanType = ModelMeanType.EPSILON,
                  var_type: ModelVarType = ModelVarType.FIXED_SMALL,
                  clip_denoised: bool = False) -> jnp.ndarray:
    """One CFG ancestral step (``p_sample_with_cfg``,
    ``gaussian_diffusion.py:1042-1098``): x0-space guidance, posterior mean
    recomputed from the guided x0, conditional branch's variance."""
    out_c = p_mean_variance(sched, out_c_raw, x, t, mean_type=mean_type,
                            var_type=var_type, clip_denoised=clip_denoised)
    out_u = p_mean_variance(sched, out_u_raw, x, t, mean_type=mean_type,
                            var_type=var_type, clip_denoised=clip_denoised)
    guided_x0 = out_u["pred_xstart"] + guidance_scale * (
        out_c["pred_xstart"] - out_u["pred_xstart"])
    new_mean, _, _ = q_posterior_mean_variance(sched, guided_x0, x, t)
    return new_mean + _nonzero_mask(t, x) * jnp.exp(0.5 * out_c["log_variance"]) * z


def ddim_step(sched: DiffusionSchedule, pred_xstart: jnp.ndarray,
              x: jnp.ndarray, t: jnp.ndarray, z: jnp.ndarray, *,
              eta: float = 0.0) -> jnp.ndarray:
    """One DDIM step from a (possibly guided) pred_xstart
    (``ddim_sample``, ``gaussian_diffusion.py:699-743``)."""
    eps = pred_eps_from_xstart(sched, x, t, pred_xstart)
    nd = x.ndim
    alpha_bar = _extract(sched.alphas_cumprod, t, nd)
    alpha_bar_prev = _extract(sched.alphas_cumprod_prev, t, nd)
    sigma = (eta
             * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
             * jnp.sqrt(1 - alpha_bar / alpha_bar_prev))
    mean_pred = (pred_xstart * jnp.sqrt(alpha_bar_prev)
                 + jnp.sqrt(jnp.maximum(1 - alpha_bar_prev - sigma ** 2, 0.0)) * eps)
    return mean_pred + _nonzero_mask(t, x) * sigma * z


def ddpm_sample_loop(sched: DiffusionSchedule,
                     model_fn: ModelFn,
                     noise: jnp.ndarray,
                     rng: jax.Array,
                     *,
                     mean_type: ModelMeanType = ModelMeanType.EPSILON,
                     var_type: ModelVarType = ModelVarType.FIXED_SMALL,
                     clip_denoised: bool = False,
                     timestep_map: Optional[jnp.ndarray] = None,
                     cond_fn=None,
                     ) -> jnp.ndarray:
    """Ancestral DDPM loop as one lax.scan (``gaussian_diffusion.py:616-693``);
    optional classifier guidance via ``cond_fn(x, t) -> grad``."""
    num_steps = sched.num_timesteps
    batch = noise.shape[0]

    def body(x, step):
        t_idx, key = step
        t = jnp.full((batch,), t_idx, dtype=jnp.int32)
        model_out = model_fn(x, _map_t(timestep_map, t))
        z = jax.random.normal(key, x.shape, dtype=x.dtype)
        x_next = ddpm_step(sched, model_out, x, t, z, mean_type=mean_type,
                           var_type=var_type, clip_denoised=clip_denoised,
                           cond_fn=cond_fn)
        return x_next, None

    ts = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(rng, num_steps)
    x_final, _ = jax.lax.scan(body, noise, (ts, keys))
    return x_final


def ddpm_sample_loop_cfg(sched: DiffusionSchedule,
                         model_fn_doubled: ModelFn,
                         noise: jnp.ndarray,
                         rng: jax.Array,
                         *,
                         guidance_scale: float = 7.5,
                         mean_type: ModelMeanType = ModelMeanType.EPSILON,
                         var_type: ModelVarType = ModelVarType.FIXED_SMALL,
                         clip_denoised: bool = False,
                         timestep_map: Optional[jnp.ndarray] = None,
                         ) -> jnp.ndarray:
    """CFG DDPM loop: one scan, one doubled-batch forward per step.

    Matches ``p_sample_loop_with_cfg`` (``gaussian_diffusion.py:1100-1141``)
    step-for-step given the same noise sequence.
    """
    num_steps = sched.num_timesteps
    batch = noise.shape[0]
    both = cfg_model_fn(model_fn_doubled)

    def body(x, step):
        t_idx, key = step
        t = jnp.full((batch,), t_idx, dtype=jnp.int32)
        out_c_raw, out_u_raw = both(x, _map_t(timestep_map, t))
        z = jax.random.normal(key, x.shape, dtype=x.dtype)
        x_next = ddpm_cfg_step(sched, out_c_raw, out_u_raw, x, t, z,
                               guidance_scale=guidance_scale,
                               mean_type=mean_type, var_type=var_type,
                               clip_denoised=clip_denoised)
        return x_next, None

    ts = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(rng, num_steps)
    x_final, _ = jax.lax.scan(body, noise, (ts, keys))
    return x_final


def ddim_sample_loop(sched: DiffusionSchedule,
                     model_fn: ModelFn,
                     noise: jnp.ndarray,
                     rng: jax.Array,
                     *,
                     eta: float = 0.0,
                     guidance_scale: Optional[float] = None,
                     mean_type: ModelMeanType = ModelMeanType.EPSILON,
                     var_type: ModelVarType = ModelVarType.FIXED_SMALL,
                     clip_denoised: bool = False,
                     timestep_map: Optional[jnp.ndarray] = None,
                     cond_fn=None,
                     ) -> jnp.ndarray:
    """DDIM loop as one lax.scan (``gaussian_diffusion.py:699-818``) with
    optional respacing, optional doubled-batch CFG, and optional classifier
    guidance (``cond_fn``, via condition_score as the reference's
    ddim_sample does, ``:719-722``).

    When ``guidance_scale`` is set, ``model_fn`` must be a doubled-batch
    model (see :func:`cfg_model_fn`) and guidance is applied in x0-space
    before the eps re-derivation — the DDIM analog of ``p_sample_with_cfg``.
    """
    num_steps = sched.num_timesteps
    batch = noise.shape[0]
    if guidance_scale is not None and cond_fn is not None:
        raise ValueError(
            "guidance_scale (CFG) and cond_fn (classifier guidance) are "
            "separate paths in this loop — passing both would silently "
            "drop cond_fn; apply classifier guidance inside model_fn or "
            "sample without CFG")
    both = cfg_model_fn(model_fn) if guidance_scale is not None else None

    def body(x, step):
        t_idx, key = step
        t = jnp.full((batch,), t_idx, dtype=jnp.int32)
        t_model = _map_t(timestep_map, t)
        if guidance_scale is not None:
            out_c_raw, out_u_raw = both(x, t_model)
            out_c = p_mean_variance(sched, out_c_raw, x, t, mean_type=mean_type,
                                    var_type=var_type, clip_denoised=clip_denoised)
            out_u = p_mean_variance(sched, out_u_raw, x, t, mean_type=mean_type,
                                    var_type=var_type, clip_denoised=clip_denoised)
            pred_xstart = out_u["pred_xstart"] + guidance_scale * (
                out_c["pred_xstart"] - out_u["pred_xstart"])
        else:
            model_out = model_fn(x, t_model)
            out = p_mean_variance(sched, model_out, x, t, mean_type=mean_type,
                                  var_type=var_type, clip_denoised=clip_denoised)
            if cond_fn is not None:
                from motiondiffusion_moe_tpu.diffusion.guidance import (
                    condition_score)

                out = condition_score(sched, cond_fn, out, x, t)
            pred_xstart = out["pred_xstart"]

        z = jax.random.normal(key, x.shape, dtype=x.dtype)
        x_next = ddim_step(sched, pred_xstart, x, t, z, eta=eta)
        return x_next, None

    ts = jnp.arange(num_steps - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(rng, num_steps)
    x_final, _ = jax.lax.scan(body, noise, (ts, keys))
    return x_final
