"""Functional Gaussian diffusion core.

Capability match of ``text2motion/models/gaussian_diffusion.py:375-992``,
re-designed TPU-first: instead of a stateful class with numpy tables gathered
on the host, the process is a frozen pytree of [T] float32 coefficient
vectors (:class:`DiffusionSchedule`) plus pure functions over it. Every
function is shape-static and jit/vmap/scan-compatible; per-timestep
coefficients are fetched with a vectorized gather (``coef[t]``) and
broadcast, replacing the reference's ``_extract_into_tensor``
(``gaussian_diffusion.py:329-341``).

Coefficient tables are computed in float64 numpy (matching the reference's
``np.float64`` precision, ``gaussian_diffusion.py:396``) and cast to float32
once at construction.
"""

from __future__ import annotations

import enum
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from motiondiffusion_moe_tpu.diffusion.schedules import get_named_beta_schedule


class ModelMeanType(enum.Enum):
    """What the denoiser predicts (``gaussian_diffusion.py:348-352``)."""

    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType(enum.Enum):
    """Reverse-process variance mode (``gaussian_diffusion.py:354-358``)."""

    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(enum.Enum):
    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


class HostTable(np.ndarray):
    """A host-resident coefficient table that still supports traced gathers.

    The schedule tables live on the HOST as numpy (any eager per-table
    device op — jnp.asarray convert programs, even device_put — costs a
    full round trip through a remote-chip tunnel, measured at seconds to
    minutes of construction stall). Inside a trace they embed as
    compile-time constants. Plain numpy would reject ``table[t]`` with a
    traced ``t`` (the public pattern used by samplers and tests), so
    indexing with a jax value converts to jnp first; ``__jax_array__``
    covers every other jnp op.
    """

    def __getitem__(self, idx):
        import jax

        if isinstance(idx, jax.Array) or (
                isinstance(idx, tuple)
                and any(isinstance(i, jax.Array) for i in idx)):
            return jnp.asarray(np.asarray(self))[idx]
        return super().__getitem__(idx)

    def __jax_array__(self):
        return jnp.asarray(np.asarray(self))


@struct.dataclass
class DiffusionSchedule:
    """All per-timestep coefficient tables as a single pytree.

    Mirrors the table set built in ``GaussianDiffusion.__init__``
    (``gaussian_diffusion.py:393-432``). Shape [T] float32 each.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # FIXED_LARGE tables (gaussian_diffusion.py:528-534)
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(betas: Optional[np.ndarray] = None,
                  *,
                  schedule_name: str = "linear",
                  num_timesteps: int = 1000) -> DiffusionSchedule:
    """Build the coefficient pytree from betas (float64 host math)."""
    if betas is None:
        betas = get_named_beta_schedule(schedule_name, num_timesteps)
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = (
        betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    # log-calculation clipped because posterior variance is 0 at t=0
    posterior_log_variance_clipped = np.log(
        np.append(posterior_variance[1], posterior_variance[1:])
    )
    posterior_mean_coef1 = (
        betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    )
    posterior_mean_coef2 = (
        (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
    )
    fixed_large_variance = np.append(posterior_variance[1], betas[1:])
    fixed_large_log_variance = np.log(fixed_large_variance)

    f32 = lambda a: np.asarray(a, dtype=np.float32).view(HostTable)
    host = DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        alphas_cumprod_next=f32(alphas_cumprod_next),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(posterior_mean_coef1),
        posterior_mean_coef2=f32(posterior_mean_coef2),
        fixed_large_variance=f32(fixed_large_variance),
        fixed_large_log_variance=f32(fixed_large_log_variance),
    )
    return host


def _extract(coef: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather coef[t] and right-broadcast to `ndim` dims.

    Vectorized replacement for ``_extract_into_tensor``
    (``gaussian_diffusion.py:329-341``).
    """
    # jnp.asarray: tables are host numpy (embedded as constants at trace
    # time); a raw numpy gather with a traced t would fail
    out = jnp.asarray(coef)[t].astype(jnp.float32)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


# --------------------------------------------------------------------------
# Forward process q
# --------------------------------------------------------------------------

def q_mean_variance(sched: DiffusionSchedule, x_start: jnp.ndarray,
                    t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """q(x_t | x_0) mean/variance/log-variance (``gaussian_diffusion.py:437-447``)."""
    nd = x_start.ndim
    mean = _extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
    variance = _extract(1.0 - sched.alphas_cumprod, t, nd)
    log_variance = _extract(sched.log_one_minus_alphas_cumprod, t, nd)
    return mean, variance, log_variance


def q_sample(sched: DiffusionSchedule, x_start: jnp.ndarray, t: jnp.ndarray,
             noise: jnp.ndarray) -> jnp.ndarray:
    """x_t = sqrt(abar)*x0 + sqrt(1-abar)*eps (``gaussian_diffusion.py:449-460``)."""
    nd = x_start.ndim
    return (_extract(sched.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(sched.sqrt_one_minus_alphas_cumprod, t, nd) * noise)


def q_posterior_mean_variance(sched: DiffusionSchedule, x_start: jnp.ndarray,
                              x_t: jnp.ndarray, t: jnp.ndarray
                              ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """q(x_{t-1} | x_t, x_0) (``gaussian_diffusion.py:462-475``)."""
    nd = x_t.ndim
    mean = (_extract(sched.posterior_mean_coef1, t, nd) * x_start
            + _extract(sched.posterior_mean_coef2, t, nd) * x_t)
    variance = _extract(sched.posterior_variance, t, nd)
    log_variance = _extract(sched.posterior_log_variance_clipped, t, nd)
    return mean, variance, log_variance


# --------------------------------------------------------------------------
# Parameterization conversions
# --------------------------------------------------------------------------

def pred_xstart_from_eps(sched: DiffusionSchedule, x_t: jnp.ndarray,
                         t: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
    """``_predict_xstart_from_eps`` (``gaussian_diffusion.py:556-562``)."""
    nd = x_t.ndim
    return (_extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(sched.sqrt_recipm1_alphas_cumprod, t, nd) * eps)


def pred_xstart_from_xprev(sched: DiffusionSchedule, x_t: jnp.ndarray,
                           t: jnp.ndarray, xprev: jnp.ndarray) -> jnp.ndarray:
    """``_predict_xstart_from_xprev`` (``gaussian_diffusion.py:564-572``)."""
    nd = x_t.ndim
    c1 = _extract(1.0 / sched.posterior_mean_coef1, t, nd)
    c2 = _extract(sched.posterior_mean_coef2 / sched.posterior_mean_coef1, t, nd)
    return c1 * xprev - c2 * x_t


def pred_eps_from_xstart(sched: DiffusionSchedule, x_t: jnp.ndarray,
                         t: jnp.ndarray, xstart: jnp.ndarray) -> jnp.ndarray:
    """``_predict_eps_from_xstart`` (``gaussian_diffusion.py:574-578``)."""
    nd = x_t.ndim
    return ((_extract(sched.sqrt_recip_alphas_cumprod, t, nd) * x_t - xstart)
            / _extract(sched.sqrt_recipm1_alphas_cumprod, t, nd))


# --------------------------------------------------------------------------
# Reverse process p
# --------------------------------------------------------------------------

def p_mean_variance(sched: DiffusionSchedule,
                    model_output: jnp.ndarray,
                    x: jnp.ndarray,
                    t: jnp.ndarray,
                    *,
                    mean_type: ModelMeanType = ModelMeanType.EPSILON,
                    var_type: ModelVarType = ModelVarType.FIXED_SMALL,
                    clip_denoised: bool = False,
                    denoised_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
                    ) -> Dict[str, jnp.ndarray]:
    """p(x_{t-1} | x_t) mean/variance from a raw model output.

    Mirrors ``p_mean_variance`` (``gaussian_diffusion.py:481-554``) but takes
    the model output as an argument so the caller controls the forward pass
    (enabling doubled-batch CFG and scan-compiled loops).
    """
    nd = x.ndim

    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        c = x.shape[-1]
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        assert model_output.shape[-1] == c
        if var_type == ModelVarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = _extract(sched.posterior_log_variance_clipped, t, nd)
            max_log = _extract(jnp.log(sched.betas), t, nd)
            frac = (model_var_values + 1) / 2  # [-1,1] -> [0,1]
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif var_type == ModelVarType.FIXED_LARGE:
        model_variance = _extract(sched.fixed_large_variance, t, nd)
        model_log_variance = _extract(sched.fixed_large_log_variance, t, nd)
    elif var_type == ModelVarType.FIXED_SMALL:
        model_variance = _extract(sched.posterior_variance, t, nd)
        model_log_variance = _extract(sched.posterior_log_variance_clipped, t, nd)
    else:
        raise NotImplementedError(var_type)

    def process_xstart(x0: jnp.ndarray) -> jnp.ndarray:
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    if mean_type == ModelMeanType.PREVIOUS_X:
        pred_xstart = process_xstart(
            pred_xstart_from_xprev(sched, x, t, model_output))
        model_mean = model_output
    elif mean_type in (ModelMeanType.START_X, ModelMeanType.EPSILON):
        if mean_type == ModelMeanType.START_X:
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(
                pred_xstart_from_eps(sched, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    else:
        raise NotImplementedError(mean_type)

    return {
        "mean": model_mean,
        "variance": model_variance,
        "log_variance": model_log_variance,
        "pred_xstart": pred_xstart,
    }


# --------------------------------------------------------------------------
# Likelihood terms (VB / KL path, gaussian_diffusion.py:271-326, 898-921)
# --------------------------------------------------------------------------

def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N1 || N2) in nats (``gaussian_diffusion.py:271-290``)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def _approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(
        jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a discretized Gaussian on [-1,1]/255 bins
    (``gaussian_diffusion.py:293-326``)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = _approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = _approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    return log_probs


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dims (``gaussian_diffusion.py:262-267``)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def vb_terms_bpd(sched: DiffusionSchedule, model_output: jnp.ndarray,
                 x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray,
                 *, mean_type: ModelMeanType, var_type: ModelVarType,
                 clip_denoised: bool = False) -> Dict[str, jnp.ndarray]:
    """One VB term in bits-per-dim (``gaussian_diffusion.py:898-921``)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(sched, model_output, x_t, t, mean_type=mean_type,
                          var_type=var_type, clip_denoised=clip_denoised)
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = mean_flat(kl) / np.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"])
    decoder_nll = mean_flat(decoder_nll) / np.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


# --------------------------------------------------------------------------
# Training loss terms
# --------------------------------------------------------------------------

def training_loss_terms(sched: DiffusionSchedule,
                        model_output: jnp.ndarray,
                        x_start: jnp.ndarray,
                        x_t: jnp.ndarray,
                        t: jnp.ndarray,
                        noise: jnp.ndarray,
                        *,
                        mean_type: ModelMeanType = ModelMeanType.EPSILON,
                        var_type: ModelVarType = ModelVarType.FIXED_SMALL,
                        loss_type: LossType = LossType.MSE,
                        ) -> Dict[str, jnp.ndarray]:
    """Per-sample diffusion loss terms.

    Mirrors ``training_losses`` (``gaussian_diffusion.py:923-992``) minus the
    model forward (caller supplies ``model_output``) and minus the MoE aux
    term (owned by the training step). Returns per-sample ``loss`` plus raw
    ``target``/``pred`` tensors, which the trainer re-weights with the frame
    mask exactly as ``ddpm_trainer.py:208-217`` does.
    """
    terms: Dict[str, jnp.ndarray] = {}

    if loss_type.is_vb():
        vb = vb_terms_bpd(sched, model_output, x_start, x_t, t,
                          mean_type=mean_type, var_type=var_type)
        terms["loss"] = vb["output"]
        if loss_type == LossType.RESCALED_KL:
            terms["loss"] = terms["loss"] * sched.num_timesteps
        target = x_start  # for API uniformity
        terms["target"], terms["pred"] = target, vb["pred_xstart"]
        return terms

    # MSE path (gaussian_diffusion.py:941-992)
    if var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
        c = x_t.shape[-1]
        model_output, model_var_values = jnp.split(model_output, 2, axis=-1)
        # Learn the variance with the VB term, frozen mean (stop-gradient on
        # the mean half), as in Improved-DDPM (gaussian_diffusion.py:946-961).
        frozen_out = jnp.concatenate(
            [jax.lax.stop_gradient(model_output), model_var_values], axis=-1)
        vb = vb_terms_bpd(sched, frozen_out, x_start, x_t, t,
                          mean_type=mean_type, var_type=var_type)
        terms["vb"] = vb["output"]
        if loss_type == LossType.RESCALED_MSE:
            terms["vb"] = terms["vb"] * (sched.num_timesteps / 1000.0)

    if mean_type == ModelMeanType.PREVIOUS_X:
        target, _, _ = q_posterior_mean_variance(sched, x_start, x_t, t)
    elif mean_type == ModelMeanType.START_X:
        target = x_start
    elif mean_type == ModelMeanType.EPSILON:
        target = noise
    else:
        raise NotImplementedError(mean_type)

    terms["target"] = target
    terms["pred"] = model_output
    terms["mse"] = mean_flat((target - model_output) ** 2)
    terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
    return terms
