"""DPM-Solver++(2M): fast high-order ODE sampling.

The reference ships a self-described stub "for demonstration" that is not
mathematically DPM-Solver (``gaussian_diffusion.py:841-890``, never called).
This is the real algorithm (Lu et al. 2022, multistep 2nd-order,
data-prediction / "++" formulation), implemented as one ``lax.scan`` with
optional doubled-batch CFG — typically matching 50-step DDIM quality in
10-20 steps, a further ~3x sampling-cost cut.

Math (x0-parameterization): with alpha_t = sqrt(abar_t),
sigma_t = sqrt(1-abar_t), lambda_t = log(alpha_t/sigma_t), step i:

    h_i   = lambda_i - lambda_{i-1}
    r_i   = h_{i-1} / h_i
    D_i   = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}     (2M update)
    x_i   = (sigma_i / sigma_{i-1}) x_{i-1} - alpha_i (e^{-h_i} - 1) D_i

First step (no history) falls back to first order (DDIM, eta=0).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from motiondiffusion_moe_tpu.diffusion.gaussian import (
    DiffusionSchedule,
    ModelMeanType,
    ModelVarType,
    p_mean_variance,
)
from motiondiffusion_moe_tpu.diffusion.sampling import ModelFn, cfg_model_fn


def dpm_solver_timesteps(num_train_steps: int, num_steps: int) -> np.ndarray:
    """Uniform-in-t step selection t_0=T-1 > ... > t_N=0 (int timesteps)."""
    return np.linspace(num_train_steps - 1, 0, num_steps + 1).round().astype(
        np.int32)


def dpm_solver_pp_2m(sched: DiffusionSchedule,
                     model_fn: ModelFn,
                     noise: jnp.ndarray,
                     *,
                     num_steps: int = 10,
                     guidance_scale: Optional[float] = None,
                     mean_type: ModelMeanType = ModelMeanType.EPSILON,
                     var_type: ModelVarType = ModelVarType.FIXED_SMALL,
                     clip_denoised: bool = False,
                     denoise_final: bool = True) -> jnp.ndarray:
    """Sample with DPM-Solver++(2M). ``model_fn`` is doubled-batch when
    ``guidance_scale`` is set (CFG in x0-space, like the DDIM path).

    ``denoise_final``: after integrating to t=0 the state still carries the
    t=0 noise level (sigma_0 = sqrt(beta_0)); a last x0-prediction removes
    it (the standard "denoise to zero" step).
    """
    batch = noise.shape[0]
    nd = noise.ndim
    T = sched.num_timesteps
    ts = jnp.asarray(dpm_solver_timesteps(T, num_steps))  # [N+1]

    abar = sched.alphas_cumprod
    alpha = jnp.sqrt(abar)
    sigma = jnp.sqrt(1.0 - abar)
    lam = jnp.log(alpha) - jnp.log(sigma)

    both = cfg_model_fn(model_fn) if guidance_scale is not None else None

    def pred_x0(x, t_idx):
        t = jnp.full((batch,), t_idx, dtype=jnp.int32)
        if guidance_scale is not None:
            out_c_raw, out_u_raw = both(x, t)
            out_c = p_mean_variance(sched, out_c_raw, x, t,
                                    mean_type=mean_type, var_type=var_type,
                                    clip_denoised=clip_denoised)
            out_u = p_mean_variance(sched, out_u_raw, x, t,
                                    mean_type=mean_type, var_type=var_type,
                                    clip_denoised=clip_denoised)
            return out_u["pred_xstart"] + guidance_scale * (
                out_c["pred_xstart"] - out_u["pred_xstart"])
        out = p_mean_variance(sched, model_fn(x, t), x, t,
                              mean_type=mean_type, var_type=var_type,
                              clip_denoised=clip_denoised)
        return out["pred_xstart"]

    def expand(v):
        return v.reshape((1,) * nd)

    def body(carry, i):
        x, x0_prev, lam_prev_prev, has_prev = carry
        t_prev = ts[i]       # current noise level of x
        t_cur = ts[i + 1]    # target level
        x0 = pred_x0(x, t_prev)

        lam_prev = lam[t_prev]
        lam_cur = lam[t_cur]
        h = lam_cur - lam_prev
        sig_ratio = sigma[t_cur] / sigma[t_prev]
        coef = alpha[t_cur] * (jnp.exp(-h) - 1.0)

        # 2nd-order correction when history exists
        h_prev = lam_prev - lam_prev_prev
        r = h_prev / h
        d_2m = (1.0 + 1.0 / (2.0 * r)) * x0 - (1.0 / (2.0 * r)) * x0_prev
        d = jnp.where(has_prev, d_2m, x0)

        x_next = expand(sig_ratio) * x - expand(coef) * d
        return (x_next, x0, lam_prev, jnp.asarray(True)), None

    init = (noise, jnp.zeros_like(noise), lam[ts[0]], jnp.asarray(False))
    (x_final, _, _, _), _ = jax.lax.scan(body, init,
                                         jnp.arange(num_steps))
    if denoise_final:
        x_final = pred_x0(x_final, ts[-1])
    return x_final
