"""MoE routing correctness tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.models.moe import (
    DenseFFN,
    MoEMultiBranchFFN,
    SwitchMoELayer,
    switch_aux_loss,
)


def _init_and_run(m, x, rng=0, **apply_kw):
    params = m.init(jax.random.key(rng), x)
    return params, m.apply(params, x, mutable=["moe_losses", "moe_metrics"],
                           **apply_kw)


class TestSwitchMoE:
    def test_output_shape(self):
        m = SwitchMoELayer(latent_dim=16, hidden_dim=32, num_experts=4)
        x = jax.random.normal(jax.random.key(1), (2, 5, 16))
        _, (out, _) = _init_and_run(m, x)
        assert out.shape == x.shape

    @pytest.mark.slow
    def test_zero_init_gate_uniform_routing(self):
        """Gate is zero-init (switch_moe.py:28-29) -> uniform probs at step 0;
        top-2 picks experts 0 and 1 with weight 1/E each."""
        m = SwitchMoELayer(latent_dim=8, hidden_dim=16, num_experts=4)
        x = jax.random.normal(jax.random.key(1), (2, 3, 8))
        _, (_, cols) = _init_and_run(m, x)
        usage = np.asarray(cols["moe_metrics"]["expert_usage"])
        assert usage[0] == 6 and usage[1:].sum() == 0  # ties -> expert 0 top-1

    def test_dense_vs_dispatch_equal(self):
        # deliberately NOT marked slow: the cheapest dense-vs-dispatch
        # parity case must run in the default (-m "not slow") subset
        """With ample capacity the two compute paths are numerically equal."""
        x = jax.random.normal(jax.random.key(2), (4, 8, 16))
        md = SwitchMoELayer(latent_dim=16, hidden_dim=32, num_experts=4,
                            compute="dense")
        params = md.init(jax.random.key(3), x)
        # make routing non-trivial: random gate
        params = jax.tree_util.tree_map_with_path(
            lambda p, v: jax.random.normal(jax.random.key(7), v.shape) * 0.5
            if "gate" in jax.tree_util.keystr(p) and v.ndim == 2 else v, params)
        out_d = md.apply(params, x, mutable=["moe_losses", "moe_metrics"])[0]
        mc = SwitchMoELayer(latent_dim=16, hidden_dim=32, num_experts=4,
                            compute="dispatch", capacity_factor=4.0)
        out_c = mc.apply(params, x, mutable=["moe_losses", "moe_metrics"])[0]
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_c),
                                   atol=1e-5)

    def test_dispatch_drops_overflow(self):
        """With capacity_factor -> 0 every token overflows -> output ~ 0."""
        x = jax.random.normal(jax.random.key(2), (2, 64, 16))
        m = SwitchMoELayer(latent_dim=16, hidden_dim=32, num_experts=4,
                           compute="dispatch", capacity_factor=1e-9)
        _, (out, _) = _init_and_run(m, x)
        # capacity is clamped to >=1, so at most E tokens route; most output
        # rows are exactly zero
        zero_rows = np.asarray((jnp.abs(out).sum(-1) == 0)).mean()
        assert zero_rows > 0.9

    def test_top1_vs_top2(self):
        x = jax.random.normal(jax.random.key(2), (2, 4, 16))
        m1 = SwitchMoELayer(latent_dim=16, hidden_dim=32, num_experts=4, top_k=1)
        m2 = SwitchMoELayer(latent_dim=16, hidden_dim=32, num_experts=4, top_k=2)
        p1, (o1, _) = _init_and_run(m1, x)
        o2 = m2.apply(p1, x, mutable=["moe_losses", "moe_metrics"])[0]
        # top-2 includes the top-1 contribution plus more
        assert not np.allclose(np.asarray(o1), np.asarray(o2))

    def test_aux_loss_balanced_is_one(self):
        """Perfectly balanced routing gives aux = 1."""
        S, E = 8, 4
        probs = jnp.full((S, E), 1.0 / E)
        top1 = jnp.arange(S) % E
        aux = switch_aux_loss(probs, top1, E)
        assert float(aux) == pytest.approx(1.0)

    def test_aux_loss_collapsed_is_e(self):
        """All mass on one expert gives aux = E (the worst case)."""
        S, E = 8, 4
        probs = jax.nn.one_hot(jnp.zeros(S, jnp.int32), E)
        top1 = jnp.zeros(S, jnp.int32)
        aux = switch_aux_loss(probs, top1, E)
        assert float(aux) == pytest.approx(E)

    def test_aux_loss_has_gradient(self):
        """The whole point of the divergence from the reference: gradients
        flow through the aux loss into the gate weights
        (the reference's counter-based loss has zero gradient,
        switch_moe.py:70-92)."""
        m = SwitchMoELayer(latent_dim=8, hidden_dim=16, num_experts=4)
        x = jax.random.normal(jax.random.key(1), (2, 3, 8))
        params = m.init(jax.random.key(0), x)

        def loss_fn(p):
            _, cols = m.apply(p, x, mutable=["moe_losses", "moe_metrics"])
            return jnp.sum(jax.tree_util.tree_leaves(cols["moe_losses"])[0])

        grads = jax.grad(loss_fn)(params)
        gate_grad = grads["params"]["gate"]["kernel"]
        assert float(jnp.abs(gate_grad).sum()) > 0

    def test_jit_and_grad(self):
        m = SwitchMoELayer(latent_dim=16, hidden_dim=32, num_experts=4)
        x = jax.random.normal(jax.random.key(1), (2, 5, 16))
        params = m.init(jax.random.key(0), x)

        @jax.jit
        def step(p, x):
            def loss(p):
                out = m.apply(p, x, mutable=["moe_losses", "moe_metrics"])[0]
                return jnp.sum(out ** 2)
            return jax.value_and_grad(loss)(p)

        val, grads = step(params, x)
        assert np.isfinite(float(val))
        assert all(np.isfinite(np.asarray(g)).all()
                   for g in jax.tree_util.tree_leaves(grads))


class TestFFNBlocks:
    def test_moe_multibranch(self):
        m = MoEMultiBranchFFN(latent_dim=16, ffn_dim=32, num_experts=4,
                              num_branches=2, time_embed_dim=64)
        x = jax.random.normal(jax.random.key(1), (2, 5, 16))
        emb = jax.random.normal(jax.random.key(2), (2, 64))
        params = m.init(jax.random.key(0), x, emb)
        out, cols = m.apply(params, x, emb,
                            mutable=["moe_losses", "moe_metrics"])
        assert out.shape == x.shape
        assert len(jax.tree_util.tree_leaves(cols["moe_losses"])) == 2

    def test_moe_zero_style_is_residual_identity(self):
        """Style out layer is zero-init -> block output == input at init."""
        m = MoEMultiBranchFFN(latent_dim=16, ffn_dim=32, num_experts=4,
                              time_embed_dim=64)
        x = jax.random.normal(jax.random.key(1), (2, 5, 16))
        emb = jax.random.normal(jax.random.key(2), (2, 64))
        params = m.init(jax.random.key(0), x, emb)
        out = m.apply(params, x, emb, mutable=["moe_losses", "moe_metrics"])[0]
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_dense_ffn(self):
        m = DenseFFN(latent_dim=16, ffn_dim=32, time_embed_dim=64)
        x = jax.random.normal(jax.random.key(1), (2, 5, 16))
        emb = jax.random.normal(jax.random.key(2), (2, 64))
        params = m.init(jax.random.key(0), x, emb)
        out = m.apply(params, x, emb)
        assert out.shape == x.shape
