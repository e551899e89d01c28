"""Classifier guidance + bits-per-dim loop tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.diffusion import (
    ddim_sample_loop,
    ddpm_sample_loop,
    make_schedule,
    p_mean_variance,
    q_sample,
)
from motiondiffusion_moe_tpu.diffusion.guidance import (
    calc_bpd_loop,
    condition_mean,
    condition_score,
    prior_bpd,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(schedule_name="linear", num_timesteps=100)


def exact_model(sched, x0_value=0.0):
    def model(x, t):
        a = jnp.sqrt(sched.alphas_cumprod[t]).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        s = jnp.sqrt(1 - sched.alphas_cumprod[t]).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return (x - a * x0_value) / s

    return model


class TestConditioning:
    def test_condition_mean_shifts(self, sched):
        model = exact_model(sched)
        x = jax.random.normal(jax.random.key(0), (2, 4, 4))
        t = jnp.asarray([50, 50])
        out = p_mean_variance(sched, model(x, t), x, t)
        grad = jnp.ones_like(x)
        new_mean = condition_mean(lambda x_, t_: grad, out, x, t)
        np.testing.assert_allclose(
            np.asarray(new_mean - out["mean"]),
            np.broadcast_to(np.asarray(out["variance"]), x.shape), atol=1e-6)

    def test_condition_score_zero_grad_identity(self, sched):
        model = exact_model(sched)
        x = jax.random.normal(jax.random.key(0), (2, 4, 4))
        t = jnp.asarray([50, 50])
        out = p_mean_variance(sched, model(x, t), x, t)
        out2 = condition_score(sched, lambda x_, t_: jnp.zeros_like(x_),
                               out, x, t)
        np.testing.assert_allclose(np.asarray(out2["mean"]),
                                   np.asarray(out["mean"]), atol=1e-5)

    def test_guided_ddpm_moves_toward_target(self, sched):
        """cond_fn as the gradient of log p(y|x) pulls samples toward the
        target. Uses a WEAK model (eps=0): an exact denoiser pins x0 and
        washes the guidance out at the low-variance final steps."""
        model = lambda x, t: jnp.zeros_like(x)
        target = 2.0

        def cond_fn(x, t):
            return 0.5 * (target - x)

        noise = jax.random.normal(jax.random.key(0), (2, 4, 4))
        plain = ddpm_sample_loop(sched, model, noise, jax.random.key(1))
        guided = ddpm_sample_loop(sched, model, noise, jax.random.key(1),
                                  cond_fn=cond_fn)
        assert float(jnp.abs(guided - target).mean()) < \
            0.2 * float(jnp.abs(plain - target).mean())

    def test_guided_ddim_runs(self, sched):
        model = exact_model(sched)
        noise = jax.random.normal(jax.random.key(0), (1, 4, 4))
        out = ddim_sample_loop(sched, model, noise, jax.random.key(1),
                               cond_fn=lambda x, t: 0.1 * (1.0 - x))
        assert np.isfinite(np.asarray(out)).all()


class TestBpd:
    def test_prior_bpd_small_for_standard_normal_endpoint(self, sched):
        x0 = jnp.zeros((2, 4, 4))
        p = prior_bpd(sched, x0)
        # q(x_T | 0) = N(0, 1-abar_T) ~ N(0, I): tiny KL
        assert float(p.max()) < 0.1

    def test_calc_bpd_loop_perfect_model(self, sched):
        """An exact eps model drives the per-step VB terms near zero."""
        x0 = jnp.full((2, 4, 4), 0.3)
        model = exact_model(sched, 0.3)
        out = calc_bpd_loop(sched, model, x0, jax.random.key(0),
                            clip_denoised=False)
        assert out["vb"].shape == (2, 100)
        assert float(out["mse"].mean()) < 1e-6      # eps recovered exactly
        assert float(out["xstart_mse"].mean()) < 1e-6
        assert np.isfinite(np.asarray(out["total_bpd"])).all()

    def test_calc_bpd_jits(self, sched):
        model = exact_model(sched)
        fn = jax.jit(lambda x, r: calc_bpd_loop(sched, model, x, r))
        out = fn(jnp.zeros((1, 4, 4)), jax.random.key(0))
        assert np.isfinite(np.asarray(out["total_bpd"])).all()
