"""Sampling loop tests: golden single-step parity + scan-loop statistics."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.diffusion import (
    ddim_sample_loop,
    ddim_step,
    ddpm_cfg_step,
    ddpm_sample_loop,
    ddpm_sample_loop_cfg,
    make_schedule,
    p_mean_variance,
    q_sample,
    respace_schedule,
    space_timesteps,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "diffusion_goldens.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(FIXTURES)


@pytest.fixture(scope="module")
def sched(g):
    return make_schedule(g["betas_linear"])


class TestGoldenSteps:
    @pytest.mark.parametrize("eta", [0.0, 0.5])
    def test_ddim_step_golden(self, sched, g, eta):
        x_t = q_sample(sched, jnp.asarray(g["x_start"]), jnp.asarray(g["t"]),
                       jnp.asarray(g["noise"]))
        out = p_mean_variance(sched, jnp.asarray(g["model_output"]), x_t,
                              jnp.asarray(g["t"]), clip_denoised=False)
        sample = ddim_step(sched, out["pred_xstart"], x_t, jnp.asarray(g["t"]),
                           jnp.zeros_like(x_t), eta=eta)
        np.testing.assert_allclose(np.asarray(sample),
                                   g[f"ddim_sample_eta{eta}"], atol=2e-4)

    def test_cfg_step_golden(self, sched, g):
        """Matches reference p_sample_with_cfg with zero injected noise,
        cond=model_output, uncond=0.5*model_output, cfg=7.5."""
        x_t = q_sample(sched, jnp.asarray(g["x_start"]), jnp.asarray(g["t"]),
                       jnp.asarray(g["noise"]))
        cond = jnp.asarray(g["model_output"])
        sample = ddpm_cfg_step(sched, cond, cond * 0.5, x_t,
                               jnp.asarray(g["t"]), jnp.zeros_like(x_t),
                               guidance_scale=7.5, clip_denoised=False)
        np.testing.assert_allclose(np.asarray(sample), g["cfg_sample"],
                                   atol=5e-3)


class _ZeroEpsModel:
    """A 'perfect' model for x0=0 data: predicts eps = x_t / sqrt(1-abar)."""

    def __init__(self, sched):
        self.sched = sched

    def __call__(self, x, t):
        c = self.sched.sqrt_one_minus_alphas_cumprod[t]
        return x / c.reshape((-1,) + (1,) * (x.ndim - 1))


class TestLoops:
    def test_ddpm_loop_contracts_to_data(self, sched):
        """With a model whose implied x0 is always 0, the DDPM loop must
        converge to ~0 regardless of the starting noise."""
        model = _ZeroEpsModel(sched)
        noise = jax.random.normal(jax.random.key(0), (2, 8, 4))
        out = jax.jit(lambda n, r: ddpm_sample_loop(sched, model, n, r))(
            noise, jax.random.key(1))
        assert out.shape == noise.shape
        assert float(jnp.abs(out).mean()) < 0.15

    def test_ddim_eta0_deterministic(self, sched):
        model = _ZeroEpsModel(sched)
        noise = jax.random.normal(jax.random.key(0), (2, 8, 4))
        out1 = ddim_sample_loop(sched, model, noise, jax.random.key(1), eta=0.0)
        out2 = ddim_sample_loop(sched, model, noise, jax.random.key(2), eta=0.0)
        # eta=0 ignores the rng entirely
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=0)
        assert float(jnp.abs(out1).mean()) < 1e-3

    def test_ddim_respaced_matches_full_for_ideal_model(self, g):
        """For the ideal x0=0 model, 25-step respaced DDIM lands at the same
        fixed point as 100-step DDIM."""
        betas = g["betas_linear"]
        full = make_schedule(betas)
        spaced, tmap = respace_schedule(betas, space_timesteps(100, "ddim25"))
        assert spaced.num_timesteps == 25
        model_full = _ZeroEpsModel(full)

        class _M:
            def __call__(self, x, t):
                # t is original-scale (via timestep_map) -> use full tables
                return model_full(x, t)

        noise = jax.random.normal(jax.random.key(0), (2, 8, 4))
        out_full = ddim_sample_loop(full, model_full, noise, jax.random.key(1))
        out_spaced = ddim_sample_loop(spaced, _M(), noise, jax.random.key(1),
                                      timestep_map=jnp.asarray(tmap))
        assert float(jnp.abs(out_spaced).mean()) < 1e-3
        np.testing.assert_allclose(np.asarray(out_spaced), np.asarray(out_full),
                                   atol=1e-3)

    def test_cfg_loop_runs_and_matches_noncfg_at_scale1_equal_branches(self, sched):
        """guidance=1 with identical cond/uncond == plain DDPM, same rng."""
        model = _ZeroEpsModel(sched)

        def doubled(x2, t2):
            return model(x2, t2)

        noise = jax.random.normal(jax.random.key(0), (2, 8, 4))
        out_cfg = ddpm_sample_loop_cfg(sched, doubled, noise, jax.random.key(1),
                                       guidance_scale=1.0)
        out_plain = ddpm_sample_loop(sched, model, noise, jax.random.key(1))
        np.testing.assert_allclose(np.asarray(out_cfg), np.asarray(out_plain),
                                   atol=1e-4)

    def test_loops_jit_once(self, sched):
        """Whole loop compiles as a single XLA program (the headline win
        over the reference's 2000 Python-dispatched forwards)."""
        model = _ZeroEpsModel(sched)
        fn = jax.jit(lambda n, r: ddim_sample_loop(sched, model, n, r))
        noise = jax.random.normal(jax.random.key(0), (1, 8, 4))
        _ = fn(noise, jax.random.key(1))
        # second call hits the cache; just confirm it doesn't retrace
        with jax.checking_leaks():
            _ = fn(noise, jax.random.key(2))


class TestRespace:
    def test_space_timesteps_ddim(self):
        steps = space_timesteps(1000, "ddim50")
        assert len(steps) == 50
        assert 0 in steps

    def test_respaced_alphas_subset(self, g):
        betas = g["betas_linear"]
        full = make_schedule(betas)
        use = space_timesteps(100, "ddim25")
        spaced, tmap = respace_schedule(betas, use)
        # alphas_cumprod of the spaced schedule equals the full schedule's at
        # the mapped timesteps
        np.testing.assert_allclose(
            np.asarray(spaced.alphas_cumprod),
            np.asarray(full.alphas_cumprod)[tmap], rtol=1e-5)

    def test_section_counts(self):
        steps = space_timesteps(100, "10")
        assert len(steps) == 10

    def test_cfg_plus_cond_fn_rejected(self, sched):
        """guidance_scale and cond_fn are separate paths; passing both
        silently dropped cond_fn before — it must raise."""
        model = lambda x, t: x
        noise = jnp.zeros((2, 4, 3))
        with pytest.raises(ValueError, match="cond_fn"):
            ddim_sample_loop(sched, model, noise, jax.random.key(0),
                             guidance_scale=7.5,
                             cond_fn=lambda x, t: jnp.zeros_like(x))

    def test_generator_inputs(self, g):
        """Both functions are typed Iterable[int]; a generator must not be
        silently drained (space_timesteps crashed, respace_schedule
        returned a near-empty schedule)."""
        a = space_timesteps(100, (int(x) for x in [10, 10]))
        assert a == space_timesteps(100, [10, 10])
        betas = g["betas_linear"]
        use = sorted(space_timesteps(100, "ddim25"))
        s_list, m_list = respace_schedule(betas, use)
        s_gen, m_gen = respace_schedule(betas, iter(use))
        np.testing.assert_array_equal(m_list, m_gen)
        np.testing.assert_allclose(np.asarray(s_list.betas),
                                   np.asarray(s_gen.betas))
