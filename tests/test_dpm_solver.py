"""DPM-Solver++(2M) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.diffusion import ddim_sample_loop, make_schedule
from motiondiffusion_moe_tpu.diffusion.dpm_solver import (
    dpm_solver_pp_2m,
    dpm_solver_timesteps,
)


@pytest.fixture(scope="module")
def sched():
    return make_schedule(schedule_name="linear", num_timesteps=1000)


def exact_model(sched, x0_value=0.7):
    """Model whose eps prediction implies exactly x0 = x0_value."""

    def model(x, t):
        a = jnp.sqrt(sched.alphas_cumprod[t]).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        s = jnp.sqrt(1 - sched.alphas_cumprod[t]).reshape(
            (-1,) + (1,) * (x.ndim - 1))
        return (x - a * x0_value) / s

    return model


class TestDpmSolver:
    def test_timestep_selection(self):
        ts = dpm_solver_timesteps(1000, 10)
        assert ts[0] == 999 and ts[-1] == 0 and len(ts) == 11
        assert (np.diff(ts) < 0).all()

    def test_exact_model_10_steps(self, sched):
        model = exact_model(sched)
        noise = jax.random.normal(jax.random.key(0), (2, 8, 4))
        out = dpm_solver_pp_2m(sched, model, noise, num_steps=10)
        assert float(jnp.abs(out - 0.7).max()) < 1e-4

    def test_more_steps_not_worse(self, sched):
        model = exact_model(sched)
        noise = jax.random.normal(jax.random.key(0), (2, 8, 4))
        e10 = float(jnp.abs(
            dpm_solver_pp_2m(sched, model, noise, num_steps=10) - 0.7).max())
        e25 = float(jnp.abs(
            dpm_solver_pp_2m(sched, model, noise, num_steps=25) - 0.7).max())
        assert e25 <= e10 + 1e-5

    def test_cfg_scale_one_matches_uncond(self, sched):
        model = exact_model(sched)
        noise = jax.random.normal(jax.random.key(0), (2, 8, 4))
        a = dpm_solver_pp_2m(sched, model, noise, num_steps=10)
        b = dpm_solver_pp_2m(sched, model, noise, num_steps=10,
                             guidance_scale=1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_deterministic(self, sched):
        """DPM-Solver is an ODE solver: no rng anywhere."""
        model = exact_model(sched)
        noise = jax.random.normal(jax.random.key(0), (2, 8, 4))
        a = dpm_solver_pp_2m(sched, model, noise, num_steps=10)
        b = dpm_solver_pp_2m(sched, model, noise, num_steps=10)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_jits(self, sched):
        model = exact_model(sched)
        fn = jax.jit(lambda n: dpm_solver_pp_2m(sched, model, n, num_steps=10))
        out = fn(jax.random.normal(jax.random.key(0), (1, 8, 4)))
        assert np.isfinite(np.asarray(out)).all()

    def test_close_to_full_ddim(self, sched):
        """10-step DPM++ approximates the 1000-step DDIM ODE limit for a
        smooth (linear-in-x) model."""
        model = exact_model(sched)
        noise = jax.random.normal(jax.random.key(0), (2, 8, 4))
        dpm = dpm_solver_pp_2m(sched, model, noise, num_steps=10)
        ddim = ddim_sample_loop(sched, model, noise, jax.random.key(1))
        np.testing.assert_allclose(np.asarray(dpm), np.asarray(ddim),
                                   atol=1e-3)
