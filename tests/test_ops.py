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
    _favor_qkv_kernel,
    favor_attention,
    favor_attention_qkv,
    favor_attention_reference,
    favor_qkv_reference,
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

    @pytest.mark.slow
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


def _favor_qkv_interpret(qkv, ln_scale, ln_bias, proj, mask,
                         eps=1e-6, pre_scale=0.1):
    """Merged-QKV kernel in interpreter mode (CPU testable)."""
    import functools as ft

    B, T, HD3 = qkv.shape
    HD = HD3 // 3
    D, m = proj.shape
    H = HD // D
    maskf = (jnp.ones((B, T, 1), jnp.float32) if mask is None
             else mask.astype(jnp.float32).reshape(B, T, 1))
    return pl.pallas_call(
        ft.partial(_favor_qkv_kernel, eps=eps, pre_scale=pre_scale,
                   num_heads=H, group=1),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), qkv.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, HD3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
            pl.BlockSpec((D, m), lambda b: (0, 0)),
            pl.BlockSpec((1, T, 1), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),
        interpret=True,
    )(qkv, ln_scale.reshape(1, D), ln_bias.reshape(1, D), proj, maskf)


def _favor_qkv_v2_interpret(qkv, ln_scale, ln_bias, proj, mask,
                            eps=1e-6, pre_scale=0.1, mxu_bf16=False):
    """Block-diagonal v2 kernel (the production default) in interpreter
    mode, optionally with the bf16-matmul-operand mode."""
    import functools as ft

    from motiondiffusion_moe_tpu.ops.performer_pallas import (
        _favor_qkv_kernel_v2)

    B, T, HD3 = qkv.shape
    HD = HD3 // 3
    D, m = proj.shape
    H = HD // D
    maskf = (jnp.ones((B, T, 1), jnp.float32) if mask is None
             else mask.astype(jnp.float32).reshape(B, T, 1))
    projbd = jnp.kron(jnp.eye(H, dtype=proj.dtype), proj)
    return pl.pallas_call(
        ft.partial(_favor_qkv_kernel_v2, eps=eps, pre_scale=pre_scale,
                   num_heads=H, mxu_bf16=mxu_bf16),
        out_shape=jax.ShapeDtypeStruct((B, T, HD), qkv.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, HD3), lambda b: (b, 0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
            pl.BlockSpec((1, D), lambda b: (0, 0)),
            pl.BlockSpec((H * D, H * m), lambda b: (0, 0)),
            pl.BlockSpec((1, T, 1), lambda b: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, HD), lambda b: (b, 0, 0)),
        interpret=True,
    )(qkv, ln_scale.reshape(1, D), ln_bias.reshape(1, D), projbd, maskf)


class TestFavorQKVKernel:
    def _inputs(self, B=2, H=2, T=12, D=8, m=16):
        ks = jax.random.split(jax.random.key(3), 4)
        qkv = jax.random.normal(ks[0], (B, T, 3 * H * D))
        scale = 1.0 + 0.1 * jax.random.normal(ks[1], (D,))
        bias = 0.1 * jax.random.normal(ks[2], (D,))
        proj = jax.random.normal(ks[3], (D, m)) * (D ** -0.25)
        return qkv, scale, bias, proj

    def test_v2_kernel_matches_reference_ragged_mask(self):
        qkv, scale, bias, proj = self._inputs()
        mask = (jnp.arange(12)[None, :] < jnp.asarray([12, 7])[:, None]
                ).astype(jnp.float32)
        ref = favor_qkv_reference(qkv, scale, bias, proj, mask)
        out = _favor_qkv_v2_interpret(qkv, scale, bias, proj, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_v2_kernel_mxu_bf16_mode_close_to_reference(self):
        """FAVOR_MXU_BF16: matmul operands rounded to bf16 (f32 accum).
        Loose bound — bf16 rounding of the pre-exp logits amplifies
        through exp — but the output must track the f32 reference to ~1%
        of its scale and stay finite."""
        qkv, scale, bias, proj = self._inputs()
        mask = (jnp.arange(12)[None, :] < jnp.asarray([12, 7])[:, None]
                ).astype(jnp.float32)
        ref = np.asarray(favor_qkv_reference(qkv, scale, bias, proj, mask))
        out = np.asarray(_favor_qkv_v2_interpret(qkv, scale, bias, proj,
                                                 mask, mxu_bf16=True))
        assert np.isfinite(out).all()
        tol = 2e-2 * max(np.abs(ref).max(), 1e-3)
        np.testing.assert_allclose(out, ref, atol=tol)

    def test_kernel_matches_reference_ragged_mask(self):
        qkv, scale, bias, proj = self._inputs()
        mask = (jnp.arange(12)[None, :] < jnp.asarray([12, 7])[:, None]
                ).astype(jnp.float32)
        ref = favor_qkv_reference(qkv, scale, bias, proj, mask)
        out = _favor_qkv_interpret(qkv, scale, bias, proj, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_public_entry_cpu_fallback(self):
        qkv, scale, bias, proj = self._inputs()
        out = favor_attention_qkv(qkv, scale, bias, proj)
        ref = favor_qkv_reference(qkv, scale, bias, proj, None)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)

    def test_custom_vjp_matches_reference_grad(self):
        # deliberately NOT marked slow: the cheapest custom-VJP parity case
        # must run in the default (-m "not slow") subset
        qkv, scale, bias, proj = self._inputs(B=1, H=2, T=8, D=4, m=8)

        def f_custom(x, s, b, p):
            return jnp.sum(favor_attention_qkv(x, s, b, p) ** 2)

        def f_ref(x, s, b, p):
            return jnp.sum(favor_qkv_reference(x, s, b, p, None) ** 2)

        g1 = jax.grad(f_custom, argnums=(0, 1, 2, 3))(qkv, scale, bias, proj)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2, 3))(qkv, scale, bias, proj)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestPerformerEpilogue:
    def _inputs(self, B=3, T=10, D=16):
        ks = jax.random.split(jax.random.key(5), 7)
        y = jax.random.normal(ks[0], (B, T, D))
        scale = 0.3 * jax.random.normal(ks[1], (B, D))
        shift = 0.3 * jax.random.normal(ks[2], (B, D))
        ps = 1 + 0.1 * jax.random.normal(ks[3], (D,))
        pb = 0.1 * jax.random.normal(ks[4], (D,))
        ss = 1 + 0.1 * jax.random.normal(ks[5], (D,))
        sb = 0.1 * jax.random.normal(ks[6], (D,))
        return y, scale, shift, ps, pb, ss, sb

    def test_kernel_matches_reference(self):
        from motiondiffusion_moe_tpu.ops.performer_pallas import (
            _epilogue_kernel, performer_epilogue_reference)
        import functools as ft

        y, scale, shift, ps, pb, ss, sb = self._inputs()
        B, T, D = y.shape
        vec = pl.BlockSpec((1, D), lambda b: (0, 0))
        out = pl.pallas_call(
            _epilogue_kernel,
            out_shape=jax.ShapeDtypeStruct((B, T, D), y.dtype),
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, T, D), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0)),
                pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0)),
                vec, vec, vec, vec,
            ],
            out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0)),
            interpret=True,
        )(y, scale.reshape(B, 1, D), shift.reshape(B, 1, D),
          ps.reshape(1, D), pb.reshape(1, D),
          ss.reshape(1, D), sb.reshape(1, D))
        ref = performer_epilogue_reference(y, scale, shift, ps, pb, ss, sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)

    def test_reference_matches_module_chain(self):
        """epilogue == LN -> L2*sqrt(D) -> LN -> modulate -> SiLU."""
        from motiondiffusion_moe_tpu.ops.performer_pallas import (
            performer_epilogue_reference)

        y, scale, shift, ps, pb, ss, sb = self._inputs()
        D = y.shape[-1]

        def ln(x, s, b):
            mu = x.mean(-1, keepdims=True)
            var = ((x - mu) ** 2).mean(-1, keepdims=True)
            return (x - mu) * jax.lax.rsqrt(var + 1e-6) * s + b

        h = ln(y, ps, pb)
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)
        h = h * D ** 0.5
        h = ln(h, ss, sb)
        h = h * (1 + scale[:, None, :]) + shift[:, None, :]
        want = jax.nn.silu(h)
        got = performer_epilogue_reference(y, scale, shift, ps, pb, ss, sb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6)

    def test_vjp_matches_reference(self):
        from motiondiffusion_moe_tpu.ops.performer_pallas import (
            performer_epilogue, performer_epilogue_reference)

        args = self._inputs(B=2, T=6, D=8)
        g1 = jax.grad(lambda *a: jnp.sum(performer_epilogue(*a) ** 2),
                      argnums=tuple(range(7)))(*args)
        g2 = jax.grad(
            lambda *a: jnp.sum(performer_epilogue_reference(*a) ** 2),
            argnums=tuple(range(7)))(*args)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestFusedVsModulePerformer:
    def test_fused_equals_unfused_with_grafted_params(self):
        """The merged-QKV fused path must equal the module (FastAttention)
        path when the qkv kernel is the concat of the separate q/k/v
        kernels and the LN/projection params are shared."""
        import flax

        from motiondiffusion_moe_tpu.models.attention import (
            PerformerSelfAttention)

        kw = dict(latent_dim=32, num_heads=4, dropout=0.0,
                  time_embed_dim=128, num_features=16)
        x = jax.random.normal(jax.random.key(0), (2, 10, 32))
        emb = jax.random.normal(jax.random.key(1), (2, 128))
        mask = (jnp.arange(10)[None, :] < jnp.asarray([10, 6])[:, None]
                ).astype(jnp.float32)[..., None]

        fused = PerformerSelfAttention(**kw, fused=True)
        unfused = PerformerSelfAttention(**kw, fused=False)
        pf = fused.init(jax.random.key(2), x, emb, mask)
        pu = unfused.init(jax.random.key(2), x, emb, mask)

        # graft fused params from the unfused tree
        f = flax.traverse_util.flatten_dict(pf["params"])
        u = flax.traverse_util.flatten_dict(pu["params"])
        f[("qkv", "kernel")] = jnp.concatenate(
            [u[("query", "kernel")], u[("key", "kernel")],
             u[("value", "kernel")]], axis=1)
        f[("qkv", "bias")] = jnp.concatenate(
            [u[("query", "bias")], u[("key", "bias")],
             u[("value", "bias")]], axis=0)
        f[("fa_norm_scale",)] = u[("fast_attention", "norm", "scale")]
        f[("fa_norm_bias",)] = u[("fast_attention", "norm", "bias")]
        f[("fa_projection",)] = u[("fast_attention", "projection")]
        # shared downstream params (proj_out/style/post_norm): copy all
        for key, val in u.items():
            if key[0] in ("pre_norm", "proj_out_0", "proj_out_1",
                          "post_norm_scale", "post_norm_bias",
                          "style_block"):
                f[key] = val
        pf = {"params": flax.traverse_util.unflatten_dict(f)}

        out_f = fused.apply(pf, x, emb, mask)
        out_u = unfused.apply(pu, x, emb, mask)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
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

    @pytest.mark.slow
    def test_custom_vjp_matches_reference_grad(self):
        q, k, v = self._inputs(B=1, H=1, T=8, N=6, D=4)
        g1 = jax.grad(lambda q, k, v: jnp.sum(
            flash_cross_attention(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda q, k, v: jnp.sum(
            cross_attention_reference(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


class TestXattnFastLayout:
    """Fast-layout exact cross-attention (ops/flash_attention.py).

    On CPU these exercise the reference path; the Pallas kernel itself was
    verified on TPU (f32 rel 2.2e-4, bf16 rel 1.3e-3 vs reference at the
    flagship shape). Default-off in CrossAttentionBlock (documented
    negative result at N=77); kept for long-context conditioning.
    """

    def test_matches_module_einsum_math(self):
        import jax
        import jax.numpy as jnp
        from motiondiffusion_moe_tpu.ops.flash_attention import (
            xattn_fastlayout, xattn_fastlayout_reference)

        rng = np.random.default_rng(0)
        B, T, N, H, D = 2, 24, 11, 4, 16
        q = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, N, H * D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, N, H * D)), jnp.float32)

        out = xattn_fastlayout(q, k, v, H)
        # independent einsum formulation
        scale = D ** -0.5
        qh = np.asarray(q).reshape(B, T, H, D)
        kh = np.asarray(k).reshape(B, N, H, D)
        vh = np.asarray(v).reshape(B, N, H, D)
        scores = np.einsum("bthd,bnhd->bhtn", qh * scale, kh)
        e = np.exp(scores - scores.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        expected = np.einsum("bhtn,bnhd->bthd", probs, vh).reshape(B, T, H * D)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(xattn_fastlayout_reference(q, k, v, H)), expected,
            atol=1e-5)

    def test_custom_vjp_matches_reference(self):
        import jax
        import jax.numpy as jnp
        from motiondiffusion_moe_tpu.ops.flash_attention import (
            xattn_fastlayout, xattn_fastlayout_reference)

        rng = np.random.default_rng(1)
        B, T, N, H, D = 1, 8, 5, 2, 8
        q = jnp.asarray(rng.standard_normal((B, T, H * D)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, N, H * D)), jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, N, H * D)), jnp.float32)

        g1 = jax.grad(lambda a, b, c: jnp.sum(
            xattn_fastlayout(a, b, c, H) ** 2), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(lambda a, b, c: jnp.sum(
            xattn_fastlayout_reference(a, b, c, H) ** 2),
            argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_module_fast_path(self):
        import jax
        import jax.numpy as jnp
        from motiondiffusion_moe_tpu.models.attention import (
            CrossAttentionBlock)

        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32)
        xf = jnp.asarray(rng.standard_normal((2, 7, 16)), jnp.float32)
        kw = dict(latent_dim=32, text_latent_dim=16, num_heads=4, dropout=0.0)
        slow = CrossAttentionBlock(**kw)
        fast = CrossAttentionBlock(**kw, use_fast_xattn=True)
        params = slow.init({"params": jax.random.key(0)}, x, xf)
        a = slow.apply(params, x, xf, deterministic=True)
        b = fast.apply(params, x, xf, deterministic=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestMoEDenseFusedKernel:
    """ops/moe_pallas.py: the fused dense_fused expert-compute kernel."""

    def _inputs(self, S=96, D=128, E=4, hid=128, dtype=jnp.float32):
        ks = jax.random.split(jax.random.key(7), 6)
        x = jax.random.normal(ks[0], (S, D), dtype)
        # combine rows: top-2-of-E softmax-style weights (two nonzeros)
        probs = jax.nn.softmax(jax.random.normal(ks[1], (S, E)), axis=-1)
        vals, idx = jax.lax.top_k(probs, 2)
        combine = (jax.nn.one_hot(idx[:, 0], E) * vals[:, :1]
                   + jax.nn.one_hot(idx[:, 1], E) * vals[:, 1:2]).astype(dtype)
        w1m = (jax.random.normal(ks[2], (D, E * hid), dtype) * 0.05)
        b1r = jax.random.normal(ks[3], (1, E * hid), jnp.float32) * 0.1
        w2m = (jax.random.normal(ks[4], (E * hid, D), dtype) * 0.05)
        b2 = jax.random.normal(ks[5], (E, D), jnp.float32) * 0.1
        return x, combine, w1m, b1r.astype(dtype), w2m, b2.astype(dtype)

    def test_kernel_matches_reference_interpret(self):
        from motiondiffusion_moe_tpu.ops.moe_pallas import (
            _moe_pallas, moe_dense_fused_reference)

        args = self._inputs()
        ref = moe_dense_fused_reference(*args)
        out = _moe_pallas(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_kernel_partial_last_tile_interpret(self):
        # S=600 > TS=512 and not a multiple: exercises grid masking
        from motiondiffusion_moe_tpu.ops.moe_pallas import (
            _moe_pallas, moe_dense_fused_reference)

        args = self._inputs(S=600)
        ref = moe_dense_fused_reference(*args)
        out = _moe_pallas(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)

    def test_reference_matches_module_inline_math(self):
        # the kernel's reference == the historical inline dense_fused math
        # (bias/gelu/weighting on the f32 accumulator vs round-tripping
        # through the compute dtype: identical in f32)
        from motiondiffusion_moe_tpu.ops.moe_pallas import (
            moe_dense_fused_reference)

        x, combine, w1m, b1r, w2m, b2 = self._inputs()
        S, D = x.shape
        E, hid = 4, 128
        h = (x @ w1m).reshape(S, E, hid) + b1r.reshape(E, hid)[None]
        h = jax.nn.gelu(h)
        h = h * combine[:, :, None]
        inline = h.reshape(S, E * hid) @ w2m + combine @ b2
        ref = moe_dense_fused_reference(x, combine, w1m, b1r, w2m, b2)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(inline),
                                   atol=1e-5, rtol=1e-5)

    def test_custom_vjp_matches_reference_grad(self):
        from motiondiffusion_moe_tpu.ops.moe_pallas import (
            moe_dense_fused, moe_dense_fused_reference)

        args = self._inputs(S=48)

        def loss_k(*a):
            return jnp.sum(moe_dense_fused(*a) ** 2)

        def loss_r(*a):
            return jnp.sum(moe_dense_fused_reference(*a) ** 2)

        gk = jax.grad(loss_k, argnums=(0, 2, 4))(*args)
        gr = jax.grad(loss_r, argnums=(0, 2, 4))(*args)
        for a, b in zip(gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_module_dense_fused_deterministic_unchanged_on_cpu(self):
        # wiring: on CPU the deterministic dense_fused path routes through
        # moe_dense_fused -> reference; must match the inline XLA path
        # (non-deterministic apply with dropout=0 semantics) closely
        from motiondiffusion_moe_tpu.models.moe import SwitchMoELayer

        m = SwitchMoELayer(latent_dim=128, hidden_dim=128, num_experts=4,
                           compute="dense_fused")
        x = jax.random.normal(jax.random.key(3), (2, 24, 128))
        params = m.init(jax.random.key(0), x)
        import os
        os.environ["MOE_FUSED_KERNEL"] = "1"  # route via moe_dense_fused
        try:
            out_det = m.apply(params, x, True)
        finally:
            os.environ.pop("MOE_FUSED_KERNEL")
        out_inline = m.apply(params, x, True)  # default: inline XLA chain
        np.testing.assert_allclose(np.asarray(out_det),
                                   np.asarray(out_inline),
                                   atol=1e-5, rtol=1e-5)
