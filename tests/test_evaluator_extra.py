"""Tests for the auxiliary evaluator-family models (the Guo et al.
text2motion training components defined alongside the eval encoders,
``evaluator_models.py:101-309``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.eval.evaluator_models import (
    AttLayer,
    MovementConvDecoder,
    MovementConvEncoder,
    TextDecoder,
    TextEncoderBiGRU,
    TextVAEDecoder,
    contrastive_loss,
    positional_encoding_table,
    reparameterize,
)


class TestMovementConvDecoder:
    @pytest.mark.slow
    def test_inverts_encoder_temporal_compression(self):
        enc = MovementConvEncoder(hidden_size=32, output_size=24)
        dec = MovementConvDecoder(hidden_size=32, output_size=16)
        x = jax.random.normal(jax.random.key(0), (2, 16, 16))
        pe = enc.init(jax.random.key(1), x)
        z = enc.apply(pe, x)
        assert z.shape == (2, 4, 24)  # /4
        pd = dec.init(jax.random.key(2), z)
        y = dec.apply(pd, z)
        assert y.shape == (2, 16, 16)  # x4 back


class TestVAEComponents:
    def test_positional_encoding(self):
        pe = positional_encoding_table(10, 8)
        assert pe.shape == (10, 8)
        np.testing.assert_allclose(np.asarray(pe[0, 0::2]), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(pe[0, 1::2]), 1.0, atol=1e-7)

    def test_reparameterize_stats(self):
        mu = jnp.full((10000,), 2.0)
        logvar = jnp.full((10000,), np.log(0.25))
        z = reparameterize(jax.random.key(0), mu, logvar)
        assert float(z.mean()) == pytest.approx(2.0, abs=0.05)
        assert float(z.std()) == pytest.approx(0.5, abs=0.05)

    def test_text_vae_decoder_rollout(self):
        d = TextVAEDecoder(text_size=64, input_size=16, output_size=16,
                           hidden_size=32, n_layers=2)
        latent = jax.random.normal(jax.random.key(2), (2, 64))
        inp = jnp.zeros((2, 16))
        params = d.init(jax.random.key(4), latent, inp, jnp.asarray([0, 1]),
                        method=lambda m, l, x, p: m(x, m.get_init_hidden(l), p))
        hidden = d.apply(params, latent,
                         method=TextVAEDecoder.get_init_hidden)
        poses = []
        x = inp
        for p in range(3):
            x, hidden = d.apply(params, x, hidden,
                                jnp.full((2,), p, jnp.int32))
            poses.append(x)
        assert all(p.shape == (2, 16) for p in poses)
        assert not np.allclose(np.asarray(poses[0]), np.asarray(poses[2]))

    def test_text_decoder(self):
        td = TextDecoder(text_size=64, input_size=16, output_size=8,
                         hidden_size=32, n_layers=2)
        latent = jax.random.normal(jax.random.key(1), (2, 64))
        inp = jnp.zeros((2, 16))
        params = td.init(
            jax.random.key(5), latent, inp, jnp.asarray([0, 1]),
            jax.random.key(0),
            method=lambda m, l, x, p, r: m(x, m.get_init_hidden(l), p, r))
        hidden = td.apply(params, latent, method=TextDecoder.get_init_hidden)
        z, mu, logvar, _ = td.apply(params, inp, hidden, jnp.asarray([0, 1]),
                                    jax.random.key(6))
        assert z.shape == mu.shape == logvar.shape == (2, 8)


class TestAttLayer:
    def test_weights_normalized(self):
        a = AttLayer(value_dim=32)
        q = jax.random.normal(jax.random.key(7), (2, 24))
        k = jax.random.normal(jax.random.key(8), (2, 5, 16))
        params = a.init(jax.random.key(9), q, k)
        pred, w = a.apply(params, q, k)
        assert pred.shape == (2, 32)
        np.testing.assert_allclose(np.asarray(w.sum(axis=1)), 1.0, atol=1e-5)


class TestTextEncoderBiGRUSeq:
    @pytest.mark.slow
    def test_shapes(self):
        te = TextEncoderBiGRU(hidden_size=16)
        we = jax.random.normal(jax.random.key(10), (2, 6, 300))
        po = jax.random.normal(jax.random.key(11), (2, 6, 15))
        lens = jnp.asarray([6, 4])
        params = te.init(jax.random.key(12), we, po, lens)
        seq, last = te.apply(params, we, po, lens)
        assert seq.shape == (2, 6, 32)
        assert last.shape == (2, 32)


class TestContrastive:
    def test_zero_for_same_negative_pair(self):
        a = jnp.ones((4, 8))
        loss = contrastive_loss(a, a, jnp.zeros((4, 1)))
        assert float(loss) == pytest.approx(0.0, abs=1e-6)

    def test_margin_pushes_positives(self):
        a = jnp.zeros((4, 8))
        b = jnp.ones((4, 8)) * 0.1
        l_close = contrastive_loss(a, b, jnp.ones((4, 1)))  # label 1: dissimilar
        assert float(l_close) > 0
