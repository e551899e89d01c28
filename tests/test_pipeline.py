"""Generation pipeline + checkpoint round-trip tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.config import (
    DataConfig,
    DiffusionConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from motiondiffusion_moe_tpu.models import MotionTransformer
from motiondiffusion_moe_tpu.pipeline import GenerationPipeline
from motiondiffusion_moe_tpu.training import CheckpointManager, Trainer


def tiny_config() -> ExperimentConfig:
    return ExperimentConfig(
        name="tiny",
        data=DataConfig(dim_pose=26, max_motion_length=16,
                        min_motion_length=8, num_joints=4),
        # NOTE: >= ~100 steps: the scaled-linear schedule has beta_end =
        # (1000/T)*0.02, so tiny T drives beta -> 1 and alpha_bar -> 0
        # (1/sqrt(alpha_bar) = inf). Same degenerate behavior as the
        # reference at small T.
        diffusion=DiffusionConfig(num_timesteps=100),
        model=ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=16, num_layers=1, num_heads=2,
                          num_experts=4, text_latent_dim=16,
                          num_random_features=8, text_max_tokens=8,
                          dropout=0.0, stochastic_depth_min=1.0,
                          dtype="float32"),
        train=TrainConfig(batch_size=2),
    )


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_config()
    trainer = Trainer(cfg)
    state = trainer.init_state()
    return cfg, trainer.model, state


class TestGenerationPipeline:
    def test_ddpm_generate(self, trained):
        cfg, model, state = trained
        pipe = GenerationPipeline(cfg, model, state.params, micro_batch=2)
        outs = pipe.generate(["a person walks", "a person jumps"], [12, 16],
                             rng=jax.random.key(0))
        assert len(outs) == 2
        assert outs[0].shape == (12, 26)
        assert outs[1].shape == (16, 26)
        assert all(np.isfinite(o).all() for o in outs)

    def test_ddim_strided(self, trained):
        cfg, model, state = trained
        pipe = GenerationPipeline(cfg, model, state.params, sampler="ddim",
                                  num_inference_steps=5, micro_batch=2)
        assert pipe.sched.num_timesteps == 5
        outs = pipe.generate(["walk"], [16], rng=jax.random.key(0))
        assert outs[0].shape == (16, 26)

    def test_dpm_sampler(self, trained):
        cfg, model, state = trained
        pipe = GenerationPipeline(cfg, model, state.params, sampler="dpm",
                                  num_inference_steps=5, micro_batch=1)
        outs = pipe.generate(["walk"], [16], rng=jax.random.key(0))
        assert outs[0].shape == (16, 26)
        assert np.isfinite(outs[0]).all()

    def test_fused_motion_embeddings_match_host_path(self, trained):
        """generate_motion_embeddings (sample+embed in one device program,
        ~100x less device->host traffic) embeds exactly the motions
        generate() returns: same rng stream chunk-for-chunk, protocol
        zero-padding reproduced by the in-graph length mask."""
        from motiondiffusion_moe_tpu.eval import EvaluatorModelWrapper

        cfg, model, state = trained
        wrapper = EvaluatorModelWrapper(dim_pose=26, unit_length=4)
        pipe = GenerationPipeline(cfg, model, state.params, sampler="ddim",
                                  num_inference_steps=5, micro_batch=2)
        captions = ["walk", "jump", "run"]   # ragged tail chunk included
        lens = [12, 16, 8]
        fused = pipe.generate_motion_embeddings(
            captions, lens, wrapper, rng=jax.random.key(3))

        outs = pipe.generate(captions, lens, rng=jax.random.key(3))
        padded = np.zeros((3, 16, 26), np.float32)
        for i, o in enumerate(outs):
            padded[i, : o.shape[0]] = o
        host = wrapper.get_motion_embeddings(padded,
                                             np.asarray(lens, np.int64))
        assert fused.shape == host.shape == (3, 512)
        np.testing.assert_allclose(fused, host, rtol=2e-4, atol=2e-5)

    @pytest.mark.slow
    def test_bf16_serving_params_drift(self, trained):
        """param_dtype="bfloat16" (weights stored bf16 for serving) must
        produce motions close to the f32-weight sampler — the measured
        drift backs the bench's serving-precision mode."""
        cfg, model, state = trained
        kw = dict(sampler="ddim", num_inference_steps=5, micro_batch=2)
        ref = GenerationPipeline(cfg, model, state.params, **kw).generate(
            ["a person walks"], [16], rng=jax.random.key(3))[0]
        got_pipe = GenerationPipeline(cfg, model, state.params,
                                      param_dtype="bfloat16", **kw)
        # FAVOR+ feature projections stay f32 (they define the kernel)
        leaves = jax.tree_util.tree_leaves_with_path(got_pipe.params)
        for path, leaf in leaves:
            pstr = jax.tree_util.keystr(path)
            if "projection" in pstr:
                assert leaf.dtype == jnp.float32
            elif "kernel" in pstr:
                assert leaf.dtype == jnp.bfloat16
        got = got_pipe.generate(["a person walks"], [16],
                                rng=jax.random.key(3))[0]
        assert np.isfinite(got).all()
        scale = float(np.abs(ref).mean())
        drift = float(np.abs(got - ref).mean())
        # bf16 weight rounding is ~0.2% relative; the 5-step trajectory
        # amplifies it but it must stay far below the signal
        assert drift < 0.05 * scale, (drift, scale)

    def test_invalid_generate_inputs_raise(self, trained):
        """Mismatched caption/length lists and out-of-range lengths must
        fail loudly up front (they previously died in a cryptic reshape or
        were capped silently)."""
        cfg, model, state = trained
        pipe = GenerationPipeline(cfg, model, state.params, sampler="ddim",
                                  num_inference_steps=2, micro_batch=2)
        with pytest.raises(ValueError, match="lengths"):
            pipe.generate(["a", "b"], [16])
        with pytest.raises(ValueError, match="max_frames"):
            pipe.generate(["a"], [99])
        with pytest.raises(ValueError, match="max_frames"):
            pipe.generate(["a"], [0])
        assert pipe.generate([], []) == []

    def test_micro_batch_padding(self, trained):
        """3 prompts with micro_batch=2: tail chunk padded, one compiled
        shape, 3 outputs."""
        cfg, model, state = trained
        pipe = GenerationPipeline(cfg, model, state.params, micro_batch=2)
        outs = pipe.generate(["a", "b", "c"], [10, 12, 14],
                             rng=jax.random.key(1))
        assert [o.shape[0] for o in outs] == [10, 12, 14]

    def test_deterministic_given_rng(self, trained):
        cfg, model, state = trained
        pipe = GenerationPipeline(cfg, model, state.params, micro_batch=1)
        a = pipe.generate(["walk"], [16], rng=jax.random.key(5))[0]
        b = pipe.generate(["walk"], [16], rng=jax.random.key(5))[0]
        np.testing.assert_array_equal(a, b)


class TestCheckpoints:
    @pytest.mark.slow
    def test_save_restore_roundtrip(self, trained, tmp_path):
        cfg, model, state = trained
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(1, state, epoch=3)
        mngr.wait()
        assert mngr.latest_step() == 1

        trainer = Trainer(cfg)
        fresh = trainer.init_state(jax.random.key(42))
        restored, epoch = mngr.restore(fresh)
        assert epoch == 3
        a = jax.tree_util.tree_leaves(state.params)
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        mngr.close()

    def test_restore_none_when_empty(self, trained, tmp_path):
        cfg, model, state = trained
        mngr = CheckpointManager(str(tmp_path / "empty"))
        assert mngr.restore(state) is None
        mngr.close()

    @pytest.mark.slow
    def test_restore_legacy_rng_layout(self, trained, tmp_path):
        """Checkpoints written before the fixed-width rng buffer store
        "rng" at its natural (2,) threefry width with no "rng_width"
        entry — restore must adapt its template, not crash resume."""
        import orbax.checkpoint as ocp

        cfg, model, state = trained
        key = jax.random.key(7)  # threefry: key_data shape (2,)
        legacy = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray(5),
            "rng": np.asarray(jax.random.key_data(key)),
            "has_rng": np.asarray(True),
        }
        d = str(tmp_path / "legacy")
        m = ocp.CheckpointManager(
            d, options=ocp.CheckpointManagerOptions(create=True))
        m.save(2, args=ocp.args.StandardSave(legacy))
        m.wait_until_finished()
        m.close()

        mngr = CheckpointManager(d)
        restored, epoch, rng = mngr.restore_with_rng(state)
        assert epoch == 5
        assert int(restored.step) == int(state.step)
        assert rng is not None
        np.testing.assert_array_equal(np.asarray(jax.random.key_data(rng)),
                                      np.asarray(jax.random.key_data(key)))
        # the restored key is usable (same impl as saved)
        jax.random.normal(rng, (2,))
        mngr.close()
