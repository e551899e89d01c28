"""MotionTransformer end-to-end model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.config import ModelConfig
from motiondiffusion_moe_tpu.models import MotionTransformer
from motiondiffusion_moe_tpu.models.text_encoder import hash_tokenize
from motiondiffusion_moe_tpu.models.transformer import (
    generate_src_mask,
    sum_moe_aux_losses,
)

SMALL = ModelConfig(input_feats=26, max_frames=32, latent_dim=64, ff_size=32,
                    num_layers=2, num_heads=4, num_experts=4,
                    text_latent_dim=32, num_random_features=16,
                    text_max_tokens=12, dtype="float32")


@pytest.fixture(scope="module")
def model_and_params():
    model = MotionTransformer(config=SMALL)
    x = jnp.zeros((2, 32, 26))
    t = jnp.asarray([0, 10])
    length = jnp.asarray([20, 32])
    ids = jnp.asarray(hash_tokenize(["a person walks", ""], max_tokens=12))
    params = model.init({"params": jax.random.key(0)}, x, t, length,
                        text_ids=ids)
    return model, params


class TestForward:
    def test_shapes_and_zero_init(self, model_and_params):
        """Output layer is zero-init (transformer.py:257) -> exact zeros."""
        model, params = model_and_params
        x = jax.random.normal(jax.random.key(1), (2, 32, 26))
        out = model.apply(params, x, jnp.asarray([5, 99]),
                          jnp.asarray([32, 32]),
                          text_ids=jnp.asarray(hash_tokenize(["a", "b"], max_tokens=12)),
                          mutable=["moe_losses", "moe_metrics"])[0]
        assert out.shape == (2, 32, 26)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=0)

    def test_moe_aux_collected(self, model_and_params):
        model, params = model_and_params
        x = jax.random.normal(jax.random.key(1), (2, 32, 26))
        ids = jnp.asarray(hash_tokenize(["a", "b"], max_tokens=12))
        _, cols = model.apply(params, x, jnp.asarray([5, 99]),
                              jnp.asarray([32, 32]), text_ids=ids,
                              mutable=["moe_losses", "moe_metrics"])
        # 2 scales x 2 layers x 2 branches = 8 MoE layers
        assert len(jax.tree_util.tree_leaves(cols["moe_losses"])) == 8
        aux = sum_moe_aux_losses(cols)
        assert np.isfinite(float(aux))

    def test_precomputed_text_embeddings(self, model_and_params):
        """Passing (xf_proj, xf_out) skips the text encoder — the sampling
        path encodes once per prompt, not once per diffusion step."""
        model, params = model_and_params
        x = jax.random.normal(jax.random.key(1), (2, 32, 26))
        t = jnp.asarray([5, 99])
        length = jnp.asarray([32, 32])
        ids = jnp.asarray(hash_tokenize(["walk", "run"], max_tokens=12))
        enc = model.apply(params, ids, method=lambda m, i: m.encode_text(i))
        out1 = model.apply(params, x, t, length, text_ids=ids,
                           mutable=["moe_losses", "moe_metrics"])[0]
        out2 = model.apply(params, x, t, length,
                           xf_proj=enc.pooled, xf_out=enc.tokens,
                           mutable=["moe_losses", "moe_metrics"])[0]
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                                   atol=1e-6)

    def test_mask_respects_length(self, model_and_params):
        """Frames beyond `length` must not change valid-frame outputs...
        within the U-Net's temporal receptive field: conv up/downsample mixes
        adjacent frames, so compare only frames well inside the valid
        region."""
        model, params = model_and_params
        ids = jnp.asarray(hash_tokenize(["a", "b"], max_tokens=12))
        t = jnp.asarray([5, 99])
        length = jnp.asarray([16, 16])
        x = jax.random.normal(jax.random.key(1), (2, 32, 26))
        # train the out layer to be non-zero: bump params slightly
        params2 = jax.tree_util.tree_map(
            lambda v: v + 0.01 if v.ndim >= 2 else v, params)
        out1 = model.apply(params2, x, t, length, text_ids=ids,
                           mutable=["moe_losses", "moe_metrics"])[0]
        x_pad_changed = x.at[:, 24:].set(7.0)
        out2 = model.apply(params2, x_pad_changed, t, length, text_ids=ids,
                           mutable=["moe_losses", "moe_metrics"])[0]
        # NOTE: like the reference, cross-attention/FFN paths are per-frame
        # (no temporal mixing) and Performer masks keys, so only the conv
        # and attention receive pad info. Check early frames are stable.
        np.testing.assert_allclose(np.asarray(out1[:, :8]),
                                   np.asarray(out2[:, :8]), atol=2e-2)

    @pytest.mark.slow
    def test_stochastic_depth_with_moe_grads(self):
        """Regression: stochastic depth (p<1) with MoE sow used to leak
        tracers through lax.cond in train mode (found driving the flagship
        train step on TPU); the branchless select must support grads."""
        cfg = ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=16, num_layers=2, num_heads=2,
                          num_experts=4, text_latent_dim=16,
                          num_random_features=8, text_max_tokens=8,
                          stochastic_depth_min=0.5, dtype="float32")
        model = MotionTransformer(config=cfg)
        x = jnp.zeros((2, 16, 26))
        t = jnp.asarray([1, 5])
        ln = jnp.asarray([16, 16])
        ids = jnp.ones((2, 8), jnp.int32)
        params = model.init({"params": jax.random.key(0)}, x, t, ln,
                            text_ids=ids)

        def loss(p, k):
            out, cols = model.apply(
                p, x, t, ln, text_ids=ids, deterministic=False,
                rngs={"dropout": jax.random.fold_in(k, 0),
                      "stochdepth": jax.random.fold_in(k, 1)},
                mutable=["moe_losses", "moe_metrics"])
            return jnp.sum(out) + sum_moe_aux_losses(cols)

        g = jax.jit(jax.grad(loss))(params, jax.random.key(3))
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree_util.tree_leaves(g))

    def test_train_mode_stochastic(self, model_and_params):
        model, params = model_and_params
        x = jax.random.normal(jax.random.key(1), (2, 32, 26))
        ids = jnp.asarray(hash_tokenize(["a", "b"], max_tokens=12))
        out = model.apply(params, x, jnp.asarray([5, 99]),
                          jnp.asarray([32, 32]), text_ids=ids,
                          deterministic=False,
                          rngs={"dropout": jax.random.key(1),
                                "stochdepth": jax.random.key(2)},
                          mutable=["moe_losses", "moe_metrics"])[0]
        assert out.shape == (2, 32, 26)

    @pytest.mark.slow
    def test_grad_through_model(self, model_and_params):
        model, params = model_and_params
        x = jax.random.normal(jax.random.key(1), (2, 32, 26))
        ids = jnp.asarray(hash_tokenize(["a", "b"], max_tokens=12))

        def loss_fn(p):
            out, cols = model.apply(p, x, jnp.asarray([5, 99]),
                                    jnp.asarray([32, 32]), text_ids=ids,
                                    mutable=["moe_losses", "moe_metrics"])
            # linear term: out is exactly 0 at init (zero-init head), so a
            # quadratic loss would have zero out-kernel gradient by calculus
            return jnp.sum(out) + 0.01 * sum_moe_aux_losses(cols)

        grads = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # zero-init out layer still receives gradient
        g_out = grads["params"]["out"]["kernel"]
        assert float(jnp.abs(g_out).sum()) > 0

    @pytest.mark.slow
    def test_dense_config(self):
        cfg = ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=64, num_layers=1, num_heads=2,
                          use_moe=False, text_latent_dim=16,
                          num_random_features=8, text_max_tokens=8,
                          dtype="float32")
        model = MotionTransformer(config=cfg)
        x = jnp.zeros((1, 16, 26))
        ids = jnp.asarray(hash_tokenize(["x"], max_tokens=8))
        params = model.init({"params": jax.random.key(0)}, x,
                            jnp.asarray([1]), jnp.asarray([16]), text_ids=ids)
        out, cols = model.apply(params, x, jnp.asarray([1]), jnp.asarray([16]),
                                text_ids=ids, mutable=["moe_losses", "moe_metrics"])
        assert out.shape == x.shape
        assert len(jax.tree_util.tree_leaves(cols.get("moe_losses", {}))) == 0

    @pytest.mark.slow
    def test_bf16_compute(self):
        cfg = ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=32, num_layers=1, num_heads=2, num_experts=4,
                          text_latent_dim=16, num_random_features=8,
                          text_max_tokens=8, dtype="bfloat16")
        model = MotionTransformer(config=cfg)
        x = jnp.zeros((1, 16, 26))
        ids = jnp.asarray(hash_tokenize(["x"], max_tokens=8))
        params = model.init({"params": jax.random.key(0)}, x,
                            jnp.asarray([1]), jnp.asarray([16]), text_ids=ids)
        # params stay float32
        assert all(p.dtype == jnp.float32
                   for p in jax.tree_util.tree_leaves(params["params"]))
        out = model.apply(params, x, jnp.asarray([1]), jnp.asarray([16]),
                          text_ids=ids, mutable=["moe_losses", "moe_metrics"])[0]
        assert out.dtype == jnp.float32  # final cast
        assert np.isfinite(np.asarray(out)).all()


class TestSrcMask:
    def test_generate_src_mask(self):
        mask = generate_src_mask(5, jnp.asarray([3, 5]))
        np.testing.assert_array_equal(
            np.asarray(mask), [[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]])
