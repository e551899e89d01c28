"""Pallas kernel tests (interpret mode on CPU) vs pure-JAX references."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from motiondiffusion_moe_tpu.ops.flash_attention import (
    _flash_pallas,
    cross_attention_reference,
    flash_cross_attention,
)
from motiondiffusion_moe_tpu.ops.performer_pallas import (
    _favor_kernel,
    _favor_pallas,
    favor_attention,
    favor_attention_reference,
)


def _favor_interpret(q, k, v, projection, mask, eps=1e-6):
    """Run the Pallas favor kernel in interpreter mode (CPU testable)."""
    import functools as ft
    from jax.experimental.pallas import tpu as pltpu

    B, H, T, D = q.shape
    m = projection.shape[1]
    qf = q.reshape(B * H, T, D).astype(jnp.float32)
    kf = k.reshape(B * H, T, D).astype(jnp.float32)
    vf = v.reshape(B * H, T, D).astype(jnp.float32)
    maskf = (jnp.ones((B, 1, T), jnp.float32) if mask is None
             else mask.astype(jnp.float32))
    maskf = jnp.broadcast_to(maskf[:, None, 0, :], (B, H, T)).reshape(
        B * H, T, 1)
    out = pl.pallas_call(
        ft.partial(_favor_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((B * H, T, D), jnp.float32),
        grid=(B * H,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, T, D), lambda i: (i, 0, 0)),
            pl.BlockSpec((D, m), lambda i: (0, 0)),
            pl.BlockSpec((1, T, 1), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda i: (i, 0, 0)),
        interpret=True,
    )(qf, kf, vf, projection.astype(jnp.float32), maskf)
    return out.reshape(B, H, T, D)


class TestFavorKernel:
    def _inputs(self, B=2, H=2, T=16, D=8, m=16):
        ks = jax.random.split(jax.random.key(0), 4)
        q = jax.random.normal(ks[0], (B, H, T, D))
        k = jax.random.normal(ks[1], (B, H, T, D))
        v = jax.random.normal(ks[2], (B, H, T, D))
        proj = jax.random.normal(ks[3], (D, m)) * (D ** -0.25)
        return q, k, v, proj

    def test_kernel_matches_reference(self):
        q, k, v, proj = self._inputs()
        ref = favor_attention_reference(q, k, v, proj)
        out = _favor_interpret(q, k, v, proj, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_kernel_with_mask(self):
        q, k, v, proj = self._inputs()
        mask = jnp.asarray(
            np.random.default_rng(0).integers(0, 2, (2, 1, 16)),
            jnp.float32)
        ref = favor_attention_reference(q, k, v, proj, mask)
        out = _favor_interpret(q, k, v, proj, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_public_entry_cpu_fallback(self):
        q, k, v, proj = self._inputs()
        out = favor_attention(q, k, v, proj)
        ref = favor_attention_reference(q, k, v, proj)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_custom_vjp_matches_reference_grad(self):
        q, k, v, proj = self._inputs(B=1, H=1, T=8, D=4, m=8)

        def f_custom(q, k, v, proj):
            return jnp.sum(favor_attention(q, k, v, proj) ** 2)

        def f_ref(q, k, v, proj):
            return jnp.sum(favor_attention_reference(q, k, v, proj) ** 2)

        g1 = jax.grad(f_custom, argnums=(0, 1, 2, 3))(q, k, v, proj)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(q, k, v, proj)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestFlashCrossAttention:
    def _inputs(self, B=2, H=2, T=24, N=16, D=8):
        ks = jax.random.split(jax.random.key(1), 3)
        q = jax.random.normal(ks[0], (B, H, T, D))
        k = jax.random.normal(ks[1], (B, H, N, D))
        v = jax.random.normal(ks[2], (B, H, N, D))
        return q, k, v

    def test_reference_matches_naive(self):
        q, k, v = self._inputs()
        ref = cross_attention_reference(q, k, v)
        scores = jnp.einsum("bhtd,bhnd->bhtn", q * (8 ** -0.5), k)
        naive = jnp.einsum("bhtn,bhnd->bhtd",
                           jax.nn.softmax(scores, -1), v)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(naive),
                                   atol=1e-6)

    def test_public_entry_cpu_fallback(self):
        q, k, v = self._inputs()
        out = flash_cross_attention(q, k, v)
        ref = cross_attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_online_softmax_blocking_math(self):
        """Verify the online-softmax recurrence used by the kernel against
        full softmax, in pure numpy (the kernel's algorithm, CPU-checkable
        without Mosaic)."""
        rng = np.random.default_rng(0)
        q = rng.standard_normal((4, 8)).astype(np.float32)
        k = rng.standard_normal((20, 8)).astype(np.float32)
        v = rng.standard_normal((20, 8)).astype(np.float32)
        s_full = q @ k.T
        ref = (np.exp(s_full - s_full.max(-1, keepdims=True))
               / np.exp(s_full - s_full.max(-1, keepdims=True)).sum(-1, keepdims=True)) @ v

        block = 6
        m = np.full((4, 1), -np.inf, np.float32)
        l = np.zeros((4, 1), np.float32)
        acc = np.zeros((4, 8), np.float32)
        n_total = 20
        padded_k = np.zeros((24, 8), np.float32)
        padded_k[:20] = k
        padded_v = np.zeros((24, 8), np.float32)
        padded_v[:20] = v
        for i in range(4):
            kb = padded_k[i * block:(i + 1) * block]
            vb = padded_v[i * block:(i + 1) * block]
            s = q @ kb.T
            col = np.arange(block) + i * block
            s = np.where(col[None] < n_total, s, -np.inf)
            m_new = np.maximum(m, s.max(-1, keepdims=True))
            p = np.exp(s - m_new)
            alpha = np.exp(m - m_new)
            l = l * alpha + p.sum(-1, keepdims=True)
            acc = acc * alpha + p @ vb
            m = m_new
        np.testing.assert_allclose(acc / l, ref, atol=1e-5)

    def test_custom_vjp_matches_reference_grad(self):
        q, k, v = self._inputs(B=1, H=1, T=8, N=6, D=4)
        g1 = jax.grad(lambda q, k, v: jnp.sum(
            flash_cross_attention(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda q, k, v: jnp.sum(
            cross_attention_reference(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
