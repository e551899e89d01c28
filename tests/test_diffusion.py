"""Golden-value parity + closed-form tests for the diffusion core.

Fixtures in ``tests/fixtures/diffusion_goldens.npz`` were produced by
``tests/make_goldens.py`` running the PyTorch reference's math
(``/root/reference/text2motion/models/gaussian_diffusion.py``) on fixed
inputs with injected noise.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.diffusion import (
    DiffusionSchedule,
    LossType,
    ModelMeanType,
    ModelVarType,
    get_named_beta_schedule,
    make_schedule,
    normal_kl,
    p_mean_variance,
    pred_eps_from_xstart,
    pred_xstart_from_eps,
    q_mean_variance,
    q_posterior_mean_variance,
    q_sample,
    training_loss_terms,
)
from motiondiffusion_moe_tpu.diffusion.gaussian import _extract

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "diffusion_goldens.npz")


@pytest.fixture(scope="module")
def g():
    return np.load(FIXTURES)


@pytest.fixture(scope="module")
def sched(g):
    return make_schedule(g["betas_linear"])


MEAN_TYPES = {"eps": ModelMeanType.EPSILON, "x0": ModelMeanType.START_X,
              "xprev": ModelMeanType.PREVIOUS_X}
VAR_TYPES = {"small": ModelVarType.FIXED_SMALL, "large": ModelVarType.FIXED_LARGE}


class TestSchedules:
    @pytest.mark.parametrize("name", ["linear", "cosine", "sqrt"])
    def test_betas_match_reference(self, g, name):
        ours = get_named_beta_schedule(name, 100)
        np.testing.assert_allclose(ours, g[f"betas_{name}"], rtol=1e-12)

    def test_linear_endpoints(self):
        betas = get_named_beta_schedule("linear", 1000)
        assert betas[0] == pytest.approx(1e-4)
        assert betas[-1] == pytest.approx(0.02)

    def test_tables_closed_form(self, sched, g):
        betas = np.asarray(g["betas_linear"], dtype=np.float64)
        abar = np.cumprod(1 - betas)
        np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), abar,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sched.sqrt_alphas_cumprod),
                                   np.sqrt(abar), rtol=1e-6)
        # posterior variance formula
        abar_prev = np.append(1.0, abar[:-1])
        pv = betas * (1 - abar_prev) / (1 - abar)
        np.testing.assert_allclose(np.asarray(sched.posterior_variance), pv,
                                   rtol=1e-5)


class TestForwardProcess:
    def test_q_sample_golden(self, sched, g):
        xt = q_sample(sched, jnp.asarray(g["x_start"]), jnp.asarray(g["t"]),
                      jnp.asarray(g["noise"]))
        np.testing.assert_allclose(np.asarray(xt), g["q_sample"], atol=1e-5)

    def test_q_mean_variance_golden(self, sched, g):
        m, v, lv = q_mean_variance(sched, jnp.asarray(g["x_start"]),
                                   jnp.asarray(g["t"]))
        np.testing.assert_allclose(np.asarray(m), g["q_mean"], atol=1e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(v), g["q_var"].shape), g["q_var"], atol=1e-6)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(lv), g["q_logvar"].shape), g["q_logvar"],
            atol=1e-5)

    def test_q_posterior_golden(self, sched, g):
        m, v, lv = q_posterior_mean_variance(
            sched, jnp.asarray(g["x_start"]), jnp.asarray(g["model_output"]),
            jnp.asarray(g["t"]))
        np.testing.assert_allclose(np.asarray(m), g["qpost_mean"], atol=1e-5)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(v), g["qpost_var"].shape), g["qpost_var"],
            atol=1e-6)

    def test_q_sample_terminal_snr(self, sched):
        """At large t, x_t is nearly pure noise."""
        x0 = jnp.ones((2, 4, 4))
        noise = jnp.full((2, 4, 4), 2.0)
        t = jnp.full((2,), sched.num_timesteps - 1, dtype=jnp.int32)
        xt = q_sample(sched, x0, t, noise)
        assert float(jnp.abs(xt - 2.0).max()) < 0.5

    def test_eps_xstart_roundtrip(self, sched, g):
        x_t = jnp.asarray(g["q_sample"])
        t = jnp.asarray(g["t"])
        eps = jnp.asarray(g["noise"])
        x0 = pred_xstart_from_eps(sched, x_t, t, eps)
        eps2 = pred_eps_from_xstart(sched, x_t, t, x0)
        np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps), atol=1e-3)
        # and x0 should reconstruct x_start
        np.testing.assert_allclose(np.asarray(x0), g["x_start"], atol=1e-3)


class TestReverseProcess:
    @pytest.mark.parametrize("mean_name", list(MEAN_TYPES))
    @pytest.mark.parametrize("var_name", list(VAR_TYPES))
    def test_p_mean_variance_golden(self, sched, g, mean_name, var_name):
        x_t = q_sample(sched, jnp.asarray(g["x_start"]), jnp.asarray(g["t"]),
                       jnp.asarray(g["noise"]))
        out = p_mean_variance(sched, jnp.asarray(g["model_output"]), x_t,
                              jnp.asarray(g["t"]),
                              mean_type=MEAN_TYPES[mean_name],
                              var_type=VAR_TYPES[var_name],
                              clip_denoised=False)
        key = f"{mean_name}_{var_name}"
        np.testing.assert_allclose(np.asarray(out["mean"]),
                                   g[f"pmv_mean_{key}"], atol=2e-4)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(out["log_variance"]),
                            g[f"pmv_logvar_{key}"].shape),
            g[f"pmv_logvar_{key}"], atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["pred_xstart"]),
                                   g[f"pmv_xstart_{key}"], atol=2e-3)

    def test_learned_range_endpoints(self, sched, g):
        """LEARNED_RANGE: var_values=-1 -> posterior (min) log-var, +1 -> beta
        (max) log-var. Internal-consistency check (reference path is dead
        code with an image-era axis split; see make_goldens.py)."""
        x_t = jnp.asarray(g["q_sample"])
        t = jnp.asarray(g["t"])
        eps = jnp.asarray(g["model_output"])
        for fill, table in [(-1.0, sched.posterior_log_variance_clipped),
                            (1.0, jnp.log(sched.betas))]:
            mo = jnp.concatenate([eps, jnp.full_like(eps, fill)], axis=-1)
            out = p_mean_variance(sched, mo, x_t, t,
                                  var_type=ModelVarType.LEARNED_RANGE)
            expect = _extract(table, t, x_t.ndim)
            np.testing.assert_allclose(
                np.asarray(out["log_variance"]),
                np.broadcast_to(np.asarray(expect), x_t.shape), atol=1e-5)

    def test_learned_direct(self, sched, g):
        x_t = jnp.asarray(g["q_sample"])
        t = jnp.asarray(g["t"])
        eps = jnp.asarray(g["model_output"])
        lv = jnp.full_like(eps, -3.0)
        mo = jnp.concatenate([eps, lv], axis=-1)
        out = p_mean_variance(sched, mo, x_t, t, var_type=ModelVarType.LEARNED)
        np.testing.assert_allclose(np.asarray(out["log_variance"]), -3.0, atol=1e-6)


class TestTrainingLosses:
    def test_mse_eps_golden(self, sched, g):
        x_start = jnp.asarray(g["x_start"])
        noise = jnp.asarray(g["noise"])
        t = jnp.asarray(g["t"])
        x_t = q_sample(sched, x_start, t, noise)
        terms = training_loss_terms(sched, jnp.asarray(g["model_output"]),
                                    x_start, x_t, t, noise)
        np.testing.assert_allclose(np.asarray(terms["mse"]), g["tl_mse"],
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(terms["target"]), g["tl_target"],
                                   atol=1e-6)

    def test_perfect_model_zero_loss(self, sched, g):
        """If the model outputs the exact noise, eps-MSE is 0."""
        x_start = jnp.asarray(g["x_start"])
        noise = jnp.asarray(g["noise"])
        t = jnp.asarray(g["t"])
        x_t = q_sample(sched, x_start, t, noise)
        terms = training_loss_terms(sched, noise, x_start, x_t, t, noise)
        assert float(terms["mse"].max()) < 1e-10

    def test_kl_loss_finite(self, sched, g):
        x_start = jnp.asarray(g["x_start"])
        noise = jnp.asarray(g["noise"])
        t = jnp.asarray(g["t"])
        x_t = q_sample(sched, x_start, t, noise)
        terms = training_loss_terms(sched, jnp.asarray(g["model_output"]),
                                    x_start, x_t, t, noise,
                                    loss_type=LossType.KL)
        assert np.isfinite(np.asarray(terms["loss"])).all()

    def test_normal_kl_zero_for_identical(self):
        m = jnp.array([0.3, -1.2])
        lv = jnp.array([0.1, -0.5])
        np.testing.assert_allclose(np.asarray(normal_kl(m, lv, m, lv)), 0.0,
                                   atol=1e-7)


class TestJitCompat:
    def test_everything_jits(self, sched, g):
        @jax.jit
        def step(x_start, t, noise, model_out):
            x_t = q_sample(sched, x_start, t, noise)
            terms = training_loss_terms(sched, model_out, x_start, x_t, t, noise)
            out = p_mean_variance(sched, model_out, x_t, t)
            return terms["mse"], out["mean"]

        mse, mean = step(jnp.asarray(g["x_start"]), jnp.asarray(g["t"]),
                         jnp.asarray(g["noise"]), jnp.asarray(g["model_output"]))
        np.testing.assert_allclose(np.asarray(mse), g["tl_mse"], atol=1e-5)

    def test_schedule_is_pytree(self, sched):
        leaves = jax.tree_util.tree_leaves(sched)
        assert len(leaves) == 15
        assert all(l.dtype == jnp.float32 for l in leaves)
