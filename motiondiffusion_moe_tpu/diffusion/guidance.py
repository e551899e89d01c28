"""Classifier guidance hooks + full bits-per-dim evaluation.

Capability match of ``gaussian_diffusion.py:820-835`` (``condition_mean`` /
``condition_score``) and ``:994-1040`` (``_prior_bpd`` / ``calc_bpd_loop``).
The reference defines these but never exercises them at runtime
(SURVEY.md §2.2 #18); here they are functional and scan-compiled.

``cond_fn(x, t) -> gradient`` is a classifier log-prob gradient; the caller
closes over labels/targets.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from motiondiffusion_moe_tpu.diffusion.gaussian import (
    DiffusionSchedule,
    ModelMeanType,
    ModelVarType,
    _extract,
    mean_flat,
    normal_kl,
    pred_eps_from_xstart,
    pred_xstart_from_eps,
    q_mean_variance,
    q_posterior_mean_variance,
    q_sample,
    vb_terms_bpd,
)

CondFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def condition_mean(cond_fn: CondFn, p_mean_var: Dict[str, jnp.ndarray],
                   x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Shift the reverse-step mean by variance * grad log p(y|x)
    (``gaussian_diffusion.py:820-823``)."""
    gradient = cond_fn(x, t)
    return p_mean_var["mean"] + p_mean_var["variance"] * gradient


def condition_score(sched: DiffusionSchedule, cond_fn: CondFn,
                    p_mean_var: Dict[str, jnp.ndarray], x: jnp.ndarray,
                    t: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Score-based conditioning: shift eps by -sqrt(1-abar)*grad, re-derive
    x0 and the posterior mean (``gaussian_diffusion.py:825-835``)."""
    alpha_bar = _extract(sched.alphas_cumprod, t, x.ndim)
    eps = pred_eps_from_xstart(sched, x, t, p_mean_var["pred_xstart"])
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_fn(x, t)
    out = dict(p_mean_var)
    out["pred_xstart"] = pred_xstart_from_eps(sched, x, t, eps)
    out["mean"], _, _ = q_posterior_mean_variance(sched, out["pred_xstart"],
                                                  x, t)
    return out


def prior_bpd(sched: DiffusionSchedule, x_start: jnp.ndarray) -> jnp.ndarray:
    """KL(q(x_T|x_0) || N(0, I)) in bits/dim (``gaussian_diffusion.py:
    994-1002``)."""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, jnp.int32)
    qt_mean, _, qt_log_variance = q_mean_variance(sched, x_start, t)
    kl_prior = normal_kl(qt_mean, qt_log_variance,
                         jnp.zeros_like(qt_mean), jnp.zeros_like(qt_mean))
    return mean_flat(kl_prior) / np.log(2.0)


def calc_bpd_loop(sched: DiffusionSchedule,
                  model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
                  x_start: jnp.ndarray, rng: jax.Array, *,
                  mean_type: ModelMeanType = ModelMeanType.EPSILON,
                  var_type: ModelVarType = ModelVarType.FIXED_SMALL,
                  clip_denoised: bool = True) -> Dict[str, jnp.ndarray]:
    """Full variational bound over all timesteps, as one lax.scan
    (``gaussian_diffusion.py:1004-1040`` runs a T-step Python loop)."""
    B = x_start.shape[0]
    T = sched.num_timesteps

    def body(carry, step):
        t_idx, key = step
        t = jnp.full((B,), t_idx, jnp.int32)
        noise = jax.random.normal(key, x_start.shape, x_start.dtype)
        x_t = q_sample(sched, x_start, t, noise)
        model_out = model_fn(x_t, t)
        out = vb_terms_bpd(sched, model_out, x_start, x_t, t,
                           mean_type=mean_type, var_type=var_type,
                           clip_denoised=clip_denoised)
        xstart_mse = mean_flat((out["pred_xstart"] - x_start) ** 2)
        eps = pred_eps_from_xstart(sched, x_t, t, out["pred_xstart"])
        eps_mse = mean_flat((eps - noise) ** 2)
        return carry, (out["output"], xstart_mse, eps_mse)

    ts = jnp.arange(T - 1, -1, -1, dtype=jnp.int32)
    keys = jax.random.split(rng, T)
    _, (vb, xstart_mse, mse) = jax.lax.scan(body, None, (ts, keys))
    vb = vb.T            # [B, T]
    xstart_mse = xstart_mse.T
    mse = mse.T
    p_bpd = prior_bpd(sched, x_start)
    return {
        "total_bpd": vb.sum(axis=1) + p_bpd,
        "prior_bpd": p_bpd,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }
