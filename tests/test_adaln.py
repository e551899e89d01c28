"""Fused AdaLN kernel tests (reference parity + grads on CPU path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.models.embeddings import StylizationBlock
from motiondiffusion_moe_tpu.ops.adaln_pallas import (
    adaln_dense,
    adaln_dense_reference,
)


def _inputs(B=2, T=12, D=16):
    ks = jax.random.split(jax.random.key(0), 7)
    return (jax.random.normal(ks[0], (B, T, D)),
            jax.random.normal(ks[1], (B, D)) * 0.1,
            jax.random.normal(ks[2], (B, D)) * 0.1,
            jnp.abs(jax.random.normal(ks[3], (D,))) + 0.5,
            jax.random.normal(ks[4], (D,)) * 0.1,
            jax.random.normal(ks[5], (D, D)) * 0.05,
            jax.random.normal(ks[6], (D,)) * 0.01)


class TestAdalnKernel:
    def test_cpu_fallback_matches_reference(self):
        args = _inputs()
        np.testing.assert_allclose(np.asarray(adaln_dense(*args)),
                                   np.asarray(adaln_dense_reference(*args)),
                                   atol=1e-6)

    def test_reference_matches_module_math(self):
        """adaln_dense_reference == StylizationBlock's unfused body given
        the same params."""
        h, scale, shift, lns, lnb, w, b = _inputs()
        mu = h.mean(-1, keepdims=True)
        var = ((h - mu) ** 2).mean(-1, keepdims=True)
        normed = (h - mu) * jax.lax.rsqrt(var + 1e-6) * lns + lnb
        mod = normed * (1 + scale[:, None, :]) + shift[:, None, :]
        manual = jax.nn.silu(mod) @ w + b
        out = adaln_dense_reference(h, scale, shift, lns, lnb, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(manual),
                                   atol=1e-5)

    def test_custom_vjp_grads(self):
        args = _inputs()
        g1 = jax.grad(lambda *a: jnp.sum(adaln_dense(*a) ** 2),
                      argnums=tuple(range(7)))(*args)
        g2 = jax.grad(lambda *a: jnp.sum(adaln_dense_reference(*a) ** 2),
                      argnums=tuple(range(7)))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestStylizationFusedFlag:
    def test_fused_flag_matches_unfused(self):
        h = jax.random.normal(jax.random.key(0), (2, 8, 16))
        emb = jax.random.normal(jax.random.key(1), (2, 64))
        m0 = StylizationBlock(latent_dim=16, time_embed_dim=64, dropout=0.0,
                              fused=False)
        m1 = StylizationBlock(latent_dim=16, time_embed_dim=64, dropout=0.0,
                              fused=True)
        params = m0.init(jax.random.key(2), h, emb)
        out0 = m0.apply(params, h, emb)
        out1 = m1.apply(params, h, emb)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                                   atol=1e-5)
