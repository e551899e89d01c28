"""Serving-artifact export (tools/export.py + GenerationPipeline.from_export).

The export drops the optimizer moments / RNG / resume metadata and loads
without a Trainer or an orbax template; these tests prove the round trip
is bit-exact, the bf16 leaf rule matches the pipeline's serving cast, and
a pipeline built from the artifact actually samples.
"""

import os

import jax
import numpy as np
import pytest

from motiondiffusion_moe_tpu.config import (
    DataConfig,
    DiffusionConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from motiondiffusion_moe_tpu.data import MotionNormalizer
from motiondiffusion_moe_tpu.tools.export import export_run, load_export
from motiondiffusion_moe_tpu.training import CheckpointManager, Trainer


def _tiny_cfg(**train_kw) -> ExperimentConfig:
    return ExperimentConfig(
        name="exp",
        data=DataConfig(dim_pose=26, max_motion_length=16,
                        min_motion_length=8, num_joints=4),
        diffusion=DiffusionConfig(num_timesteps=50),
        model=ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=16, num_layers=1, num_heads=2,
                          num_experts=4, text_latent_dim=16,
                          num_random_features=8, text_max_tokens=8,
                          dropout=0.0, stochastic_depth_min=1.0,
                          dtype="float32"),
        train=TrainConfig(batch_size=4, uncond_step=False, **train_kw),
    )


def _make_run(tmp_path, cfg) -> str:
    """A minimal run dir: config.json + one saved checkpoint + meta/."""
    run = str(tmp_path / cfg.name)
    os.makedirs(run, exist_ok=True)
    cfg.save(os.path.join(run, "config.json"))
    trainer = Trainer(cfg)
    state = trainer.init_state()
    ckpt = CheckpointManager(os.path.join(run, "ckpt"))
    ckpt.save(0, state, epoch=0, rng=jax.random.key(3))
    ckpt.wait()
    MotionNormalizer(np.full(26, 0.5, np.float32),
                     np.full(26, 2.0, np.float32)).save(
        os.path.join(run, "meta"))
    return run


class TestExport:
    def test_round_trip_bit_exact(self, tmp_path):
        cfg = _tiny_cfg()
        run = _make_run(tmp_path, cfg)
        state = Trainer(cfg).init_state()
        out = export_run(run)

        assert sorted(os.listdir(out)) == [
            "config.json", "export.json", "meta", "params.msgpack"]
        cfg2, params, norm = load_export(out)
        assert cfg2 == cfg
        np.testing.assert_array_equal(norm.mean, np.full(26, 0.5))
        flat_g = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(params)}
        flat_w = {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                  jax.tree_util.tree_leaves_with_path(state.params)}
        assert set(flat_g) == set(flat_w)
        for k in flat_w:
            np.testing.assert_array_equal(flat_g[k], flat_w[k], err_msg=k)

    def test_bf16_export_leaf_rule(self, tmp_path):
        """--dtype bfloat16 casts float32 weights but keeps the FAVOR+
        random-feature projections float32 (same rule as the pipeline's
        serving cast)."""
        run = _make_run(tmp_path, _tiny_cfg())
        out32 = export_run(run)
        out = export_run(run, str(tmp_path / "bf16"), dtype="bfloat16")

        def flat(d):
            _, params, _ = load_export(d)
            return {jax.tree_util.keystr(p): np.asarray(v) for p, v in
                    jax.tree_util.tree_leaves_with_path(params)}

        f32, bf = flat(out32), flat(out)
        assert set(f32) == set(bf)
        checked_proj = checked_cast = 0
        for k, v in f32.items():
            if v.dtype != np.float32:
                assert bf[k].dtype == v.dtype, k  # ints etc. untouched
            elif "projection" in k:
                assert bf[k].dtype == np.float32, k
                checked_proj += 1
            else:
                assert str(bf[k].dtype) == "bfloat16", k
                checked_cast += 1
        assert checked_proj and checked_cast
        # and the artifact actually shrinks
        full = os.path.getsize(os.path.join(out32, "params.msgpack"))
        half = os.path.getsize(os.path.join(out, "params.msgpack"))
        assert half < 0.65 * full

    def test_use_ema_without_ema_raises(self, tmp_path):
        run = _make_run(tmp_path, _tiny_cfg())
        with pytest.raises(ValueError, match="no EMA"):
            export_run(run, str(tmp_path / "e"), use_ema=True)

    def test_exports_ema_weights(self, tmp_path):
        cfg = _tiny_cfg(ema_decay=0.999)
        run = _make_run(tmp_path, cfg)
        out = export_run(run, str(tmp_path / "ema"), use_ema=True)
        import json
        with open(os.path.join(out, "export.json")) as f:
            assert json.load(f)["use_ema"] is True

    @pytest.mark.slow
    def test_from_export_samples(self, tmp_path):
        from motiondiffusion_moe_tpu.pipeline import GenerationPipeline

        run = _make_run(tmp_path, _tiny_cfg())
        out = export_run(run)
        pipe = GenerationPipeline.from_export(
            out, sampler="ddim", num_inference_steps=5, micro_batch=2)
        assert pipe.normalizer.std[0] == 2.0
        motions = pipe.generate(["a person walks"], [16])
        assert len(motions) == 1 and np.isfinite(motions[0]).all()
        denorm = pipe.normalizer.denormalize_np(motions[0])
        assert np.isfinite(denorm).all()
