"""Attention suite tests: shapes, masking, stabilization semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.models.attention import (
    CrossAttentionBlock,
    DualSelfAttentionBlock,
    FastAttention,
    GatedCrossAttention,
    LinearTemporalCrossAttention,
    PerformerSelfAttention,
)
from motiondiffusion_moe_tpu.models.embeddings import (
    GatedFusion,
    StylizationBlock,
    TimestepEmbedding,
    grad_clamp,
    timestep_sinusoidal,
)


class TestFastAttention:
    def test_shape(self):
        m = FastAttention(head_dim=16, num_features=32)
        q = jax.random.normal(jax.random.key(0), (2, 4, 10, 16))
        params = m.init(jax.random.key(1), q, q, q)
        out = m.apply(params, q, q, q)
        assert out.shape == q.shape

    def test_projection_is_column_normalized(self):
        m = FastAttention(head_dim=16, num_features=32)
        q = jnp.zeros((1, 1, 2, 16))
        params = m.init(jax.random.key(1), q, q, q)
        proj = params["params"]["projection"]
        assert proj.shape == (16, 32)
        norms = jnp.linalg.norm(proj, axis=0) / (16 ** -0.25)
        np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-5)

    def test_projection_no_gradient(self):
        """The random-feature matrix is frozen (stop_gradient)."""
        m = FastAttention(head_dim=16, num_features=32)
        q = jax.random.normal(jax.random.key(0), (1, 2, 6, 16))
        params = m.init(jax.random.key(1), q, q, q)
        grads = jax.grad(
            lambda p: jnp.sum(m.apply(p, q, q, q) ** 2))(params)
        assert float(jnp.abs(grads["params"]["projection"]).max()) == 0.0

    def test_mask_zeroes_padded_keys(self):
        """Masked (padded) positions must not influence the output of valid
        positions."""
        m = FastAttention(head_dim=8, num_features=16)
        k1 = jax.random.key(0)
        q = jax.random.normal(k1, (1, 2, 6, 8))
        params = m.init(jax.random.key(1), q, q, q)
        mask = jnp.asarray([[1, 1, 1, 0, 0, 0]], dtype=jnp.float32)[..., None]
        out_masked = m.apply(params, q, q, q, mask=mask)
        # change the padded keys/values entirely
        q2 = q.at[:, :, 3:].set(99.0)
        out_masked2 = m.apply(params, q2, q2, q2, mask=mask)
        np.testing.assert_allclose(np.asarray(out_masked[:, :, :3]),
                                   np.asarray(out_masked2[:, :, :3]), atol=1e-4)

    def test_finite_with_extreme_inputs(self):
        """exp feature map is clamped at +-15: no inf/nan on huge inputs."""
        m = FastAttention(head_dim=8, num_features=16)
        q = jnp.full((1, 1, 4, 8), 1e6)
        params = m.init(jax.random.key(1), q, q, q)
        out = m.apply(params, q, q, q)
        assert np.isfinite(np.asarray(out)).all()


class TestGradClamp:
    def test_identity_forward(self):
        x = jnp.asarray([1.0, -2.0, 3.0])
        np.testing.assert_allclose(np.asarray(grad_clamp(x)), np.asarray(x))

    def test_clamps_backward(self):
        g = jax.grad(lambda x: jnp.sum(grad_clamp(x) * 100.0))(jnp.ones(3))
        np.testing.assert_allclose(np.asarray(g), 1.0)  # 100 -> clamp 1


class TestPerformerSelfAttention:
    def test_block(self):
        m = PerformerSelfAttention(latent_dim=32, num_heads=4, dropout=0.1,
                                   time_embed_dim=128, num_features=16)
        x = jax.random.normal(jax.random.key(0), (2, 10, 32))
        emb = jax.random.normal(jax.random.key(1), (2, 128))
        mask = jnp.ones((2, 10, 1))
        params = m.init(jax.random.key(2), x, emb, mask)
        out = m.apply(params, x, emb, mask)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_emb_dim_mismatch_uses_learned_proj(self):
        """fused_emb has latent dim (512) but blocks expect 4x — the
        divergence fix: a learned projection, stable across calls."""
        m = PerformerSelfAttention(latent_dim=32, num_heads=4, dropout=0.0,
                                   time_embed_dim=128, num_features=16)
        x = jax.random.normal(jax.random.key(0), (2, 10, 32))
        emb = jax.random.normal(jax.random.key(1), (2, 32))  # mismatched
        params = m.init(jax.random.key(2), x, emb, None)
        out1 = m.apply(params, x, emb, None)
        out2 = m.apply(params, x, emb, None)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=0)


class TestDualSelfAttention:
    def test_block(self):
        m = DualSelfAttentionBlock(latent_dim=32, num_heads=4, dropout=0.1,
                                   time_embed_dim=128, num_features=16)
        x = jax.random.normal(jax.random.key(0), (2, 10, 32))
        emb = jax.random.normal(jax.random.key(1), (2, 128))
        mask = jnp.ones((2, 10, 1))
        params = m.init(jax.random.key(2), x, emb, mask)
        out = m.apply(params, x, emb, mask)
        assert out.shape == x.shape


class TestCrossAttention:
    def _xf(self):
        x = jax.random.normal(jax.random.key(0), (2, 10, 32))
        xf = jax.random.normal(jax.random.key(1), (2, 7, 24))
        emb = jax.random.normal(jax.random.key(2), (2, 128))
        return x, xf, emb

    def test_linear_cross_attention(self):
        x, xf, emb = self._xf()
        m = LinearTemporalCrossAttention(latent_dim=32, text_latent_dim=24,
                                         num_heads=4, dropout=0.0,
                                         time_embed_dim=128)
        params = m.init(jax.random.key(3), x, xf, emb)
        out = m.apply(params, x, xf, emb)
        assert out.shape == x.shape
        # style out is zero-init and alpha=sigmoid(0)=0.5 -> out == x at init
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_linear_cross_attention_forms_agree(self):
        """The deterministic (sliced-head) and training (batched-head
        einsum) compute forms are the same math on the same params."""
        x, xf, emb = self._xf()
        m = LinearTemporalCrossAttention(latent_dim=32, text_latent_dim=24,
                                         num_heads=4, dropout=0.0,
                                         time_embed_dim=128)
        params = jax.tree_util.tree_map(
            lambda a: jax.random.normal(jax.random.key(7), a.shape,
                                        a.dtype) * 0.05,
            m.init(jax.random.key(3), x, xf, emb))
        out_det = m.apply(params, x, xf, emb, True)
        out_train = m.apply(params, x, xf, emb, False,
                            rngs={"dropout": jax.random.key(0)})
        np.testing.assert_allclose(np.asarray(out_det),
                                   np.asarray(out_train), atol=2e-5)

    def test_gated_cross_attention_zero_gate(self):
        """Outer gate zero-init -> sigmoid = 0.5; with inner output == x at
        init the whole block is identity at init."""
        x, xf, emb = self._xf()
        m = GatedCrossAttention(latent_dim=32, text_latent_dim=24,
                                num_heads=4, dropout=0.0, time_embed_dim=128)
        params = m.init(jax.random.key(3), x, xf, emb)
        out = m.apply(params, x, xf, emb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_exact_cross_attention(self):
        x, xf, emb = self._xf()
        m = CrossAttentionBlock(latent_dim=32, text_latent_dim=24, num_heads=4,
                                dropout=0.0)
        params = m.init(jax.random.key(3), x, xf)
        out = m.apply(params, x, xf)
        assert out.shape == x.shape

    def test_exact_xattn_matches_manual_softmax(self):
        """The whole-sequence computation equals a manual per-chunk loop —
        validating the claim that dropping the reference's chunking is
        bit-identical math."""
        x, xf, _ = self._xf()
        m = CrossAttentionBlock(latent_dim=32, text_latent_dim=24, num_heads=4,
                                dropout=0.0)
        params = m.init(jax.random.key(3), x, xf)
        full = m.apply(params, x, xf)
        # chunked query evaluation: process query rows 2 at a time; softmax
        # is row-wise so outputs must agree exactly
        outs = [np.asarray(m.apply(params, x[:, s:s + 2], xf))
                for s in range(0, 10, 2)]
        # Note: the residual uses x[:, s:s+2], so concatenation reproduces full
        np.testing.assert_allclose(np.concatenate(outs, axis=1),
                                   np.asarray(full), atol=1e-5)


class TestEmbeddings:
    def test_sinusoidal_matches_reference_form(self):
        t = jnp.asarray([0, 10, 999])
        emb = timestep_sinusoidal(t, 16)
        # cos-first ordering: at t=0, cos terms are 1 and sin terms are 0
        np.testing.assert_allclose(np.asarray(emb[0, :8]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(emb[0, 8:]), 0.0, atol=1e-6)

    def test_timestep_embedding(self):
        m = TimestepEmbedding(embed_dim=32)
        t = jnp.asarray([0, 500])
        params = m.init(jax.random.key(0), t)
        out = m.apply(params, t)
        assert out.shape == (2, 32)

    def test_gated_fusion(self):
        m = GatedFusion(embed_dim=32)
        a = jax.random.normal(jax.random.key(0), (2, 32))
        b = jax.random.normal(jax.random.key(1), (2, 32))
        params = m.init(jax.random.key(2), a, b)
        out = m.apply(params, a, b)
        assert out.shape == (2, 32)

    def test_stylization_zero_init(self):
        """Zero-init output layer -> contributes nothing at init."""
        m = StylizationBlock(latent_dim=16, time_embed_dim=64, dropout=0.0)
        h = jax.random.normal(jax.random.key(0), (2, 5, 16))
        emb = jax.random.normal(jax.random.key(1), (2, 64))
        params = m.init(jax.random.key(2), h, emb)
        out = m.apply(params, h, emb)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)

    def test_stylization_mismatched_emb(self):
        m = StylizationBlock(latent_dim=16, time_embed_dim=64, dropout=0.0)
        h = jax.random.normal(jax.random.key(0), (2, 5, 16))
        emb = jax.random.normal(jax.random.key(1), (2, 32))  # != 64
        params = m.init(jax.random.key(2), h, emb)
        assert "emb_proj" in params["params"]
        out = m.apply(params, h, emb)
        assert out.shape == h.shape
