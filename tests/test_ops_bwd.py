"""Grad parity for the hand-derived Pallas BACKWARD kernels
(ops/performer_pallas_bwd.py) against jax.vjp of the pure-JAX references —
run in Pallas interpret mode so the kernel math itself is exercised on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.ops.performer_pallas import (
    favor_qkv_reference,
    performer_epilogue_reference,
)
from motiondiffusion_moe_tpu.ops.performer_pallas_bwd import (
    epilogue_bwd_pallas,
    favor_qkv_bwd_pallas,
)


class TestFavorQKVBackward:
    def _inputs(self, B=2, H=2, T=12, D=8, m=16, dtype=jnp.float32):
        ks = jax.random.split(jax.random.key(11), 5)
        qkv = jax.random.normal(ks[0], (B, T, 3 * H * D), dtype)
        scale = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
        bias = 0.1 * jax.random.normal(ks[2], (D,))
        proj = jax.random.normal(ks[3], (D, m)) * (D ** -0.25)
        g = jax.random.normal(ks[4], (B, T, H * D), dtype)
        return qkv, scale, bias, proj, g

    def _reference_grads(self, qkv, scale, bias, proj, mask, g):
        _, vjp = jax.vjp(
            lambda x, s, b, p: favor_qkv_reference(x, s, b, p, mask),
            qkv, scale, bias, proj)
        return vjp(g)

    @pytest.mark.parametrize("masked", [False, True])
    def test_matches_reference_vjp(self, masked):
        qkv, scale, bias, proj, g = self._inputs()
        mask = None
        if masked:
            mask = (jnp.arange(12)[None, :]
                    < jnp.asarray([12, 7])[:, None]).astype(jnp.float32)
        ref = self._reference_grads(qkv, scale, bias, proj, mask, g)
        out = favor_qkv_bwd_pallas(qkv, scale, bias, proj, mask, g,
                                   interpret=True)
        for name, a, b in zip(("dqkv", "dscale", "dbias", "dproj"), out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4, err_msg=name)

    def test_matches_reference_vjp_4heads(self):
        qkv, scale, bias, proj, g = self._inputs(B=1, H=4, T=8, D=8, m=8)
        ref = self._reference_grads(qkv, scale, bias, proj, None, g)
        out = favor_qkv_bwd_pallas(qkv, scale, bias, proj, None, g,
                                   interpret=True)
        for name, a, b in zip(("dqkv", "dscale", "dbias", "dproj"), out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4, err_msg=name)

    def test_mxu_bf16_mode_tracks_reference_vjp(self, monkeypatch):
        """FAVOR_MXU_BF16=1: matmul operands rounded to bf16 inside the
        backward kernel (f32 accumulation). Grads must track the f32
        reference VJP to ~1-2% of each gradient's scale — the tolerance
        for the single-MXU-pass training A/B."""
        monkeypatch.setenv("FAVOR_MXU_BF16", "1")
        qkv, scale, bias, proj, g = self._inputs()
        mask = (jnp.arange(12)[None, :]
                < jnp.asarray([12, 7])[:, None]).astype(jnp.float32)
        ref = self._reference_grads(qkv, scale, bias, proj, mask, g)
        out = favor_qkv_bwd_pallas(qkv, scale, bias, proj, mask, g,
                                   interpret=True)
        for name, a, b in zip(("dqkv", "dscale", "dbias", "dproj"), out, ref):
            a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
            assert np.isfinite(a).all(), name
            tol = 2e-2 * max(np.abs(b).max(), 1e-3)
            np.testing.assert_allclose(a, b, atol=tol, err_msg=name)

    def test_bf16_activations(self):
        """bf16 qkv/g (the flagship compute dtype): grads land in bf16 for
        activations, f32 for the shared LN params."""
        qkv, scale, bias, proj, g = self._inputs(dtype=jnp.bfloat16)
        out = favor_qkv_bwd_pallas(qkv, scale, bias, proj, None, g,
                                   interpret=True)
        assert out[0].dtype == jnp.bfloat16
        assert out[1].dtype == scale.dtype
        ref = self._reference_grads(qkv, scale, bias, proj, None, g)
        np.testing.assert_allclose(
            np.asarray(out[0], np.float32), np.asarray(ref[0], np.float32),
            atol=5e-2, rtol=5e-2)


class TestEpilogueBackward:
    def _inputs(self, B=3, T=10, D=16):
        ks = jax.random.split(jax.random.key(4), 8)
        y = jax.random.normal(ks[0], (B, T, D))
        scale = 0.5 * jax.random.normal(ks[1], (B, D))
        shift = 0.5 * jax.random.normal(ks[2], (B, D))
        ps = 1.0 + 0.1 * jax.random.normal(ks[3], (D,))
        pb = 0.1 * jax.random.normal(ks[4], (D,))
        ss = 1.0 + 0.1 * jax.random.normal(ks[5], (D,))
        sb = 0.1 * jax.random.normal(ks[6], (D,))
        g = jax.random.normal(ks[7], (B, T, D))
        return (y, scale, shift, ps, pb, ss, sb), g

    def test_matches_reference_vjp(self):
        args, g = self._inputs()
        _, vjp = jax.vjp(performer_epilogue_reference, *args)
        ref = vjp(g)
        out = epilogue_bwd_pallas(*args, g, interpret=True)
        names = ("dy", "dscale", "dshift", "dpost_scale", "dpost_bias",
                 "dstyle_scale", "dstyle_bias")
        assert len(out) == len(ref) == 7
        for name, a, b in zip(names, out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4, rtol=2e-4, err_msg=name)

    def test_public_custom_vjp_grad_cpu(self):
        """On CPU the public op's backward must still be the reference vjp
        (platform_dependent) — sanity that the wiring didn't break grads."""
        from motiondiffusion_moe_tpu.ops.performer_pallas import (
            performer_epilogue)

        args, _ = self._inputs()

        def f_custom(*a):
            return jnp.sum(performer_epilogue(*a) ** 2)

        def f_ref(*a):
            return jnp.sum(performer_epilogue_reference(*a) ** 2)

        g1 = jax.grad(f_custom, argnums=tuple(range(7)))(*args)
        g2 = jax.grad(f_ref, argnums=tuple(range(7)))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
