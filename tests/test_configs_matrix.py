"""Coverage for the BASELINE.json config matrix: KIT-ML 251-dim features
and the big 16-expert expert-sharded configuration."""

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
from motiondiffusion_moe_tpu.data import DataLoader, SyntheticText2MotionDataset
from motiondiffusion_moe_tpu.diffusion.gaussian import make_schedule
from motiondiffusion_moe_tpu.models import MotionTransformer
from motiondiffusion_moe_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)
from motiondiffusion_moe_tpu.training import create_train_state, make_train_step


class TestKitConfig:
    """BASELINE config #4: KIT-ML 251-dim, variable lengths + masks."""

    @pytest.mark.slow
    def test_kit_synthetic_train_step(self):
        data = DataConfig.kit(data_root="unused")
        # tiny model on real KIT feature dims
        cfg = ExperimentConfig(
            name="kit_tiny",
            data=DataConfig(dataset_name="kit", dim_pose=251, num_joints=21,
                            max_motion_length=32, min_motion_length=24),
            diffusion=DiffusionConfig(num_timesteps=100),
            model=ModelConfig(input_feats=251, max_frames=32, latent_dim=32,
                              ff_size=16, num_layers=1, num_heads=2,
                              num_experts=4, text_latent_dim=16,
                              num_random_features=8, text_max_tokens=8,
                              dropout=0.0, stochastic_depth_min=1.0,
                              dtype="float32"),
            train=TrainConfig(batch_size=4, lr=1e-3, uncond_step=False),
        )
        assert data.dim_pose == 251 and data.num_joints == 21
        ds = SyntheticText2MotionDataset(cfg.data, size=8, seed=0)
        loader = DataLoader(ds, batch_size=4, seed=0)
        captions, motions, lengths = next(iter(loader))
        assert motions.shape == (4, 32, 251)
        assert (lengths >= 24).all()

        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        state = create_train_state(model, cfg, jax.random.key(0))
        step = make_train_step(model, sched, cfg)
        batch = {
            "motion": jnp.asarray(motions),
            "length": jnp.asarray(lengths),
            "text_ids": jnp.ones((4, 8), jnp.int32),
            "t": jnp.asarray([0, 25, 50, 99]),
            "t_weight": jnp.ones((4,)),
        }
        _, metrics = step(state, batch, jax.random.key(1))
        assert np.isfinite(float(metrics["loss_total"]))


class TestBigExpertSharded:
    """BASELINE config #5 shape: 16 experts sharded over the expert axis,
    driven through the EXPLICIT shard_map all-to-all dispatch path
    (moe_compute='dispatch' + mesh — the BASELINE north-star layout), with
    train-step parity against the XLA-SPMD dense einsum path."""

    def _cfg(self, moe_compute: str, dp: int, capacity_factor: float):
        return ExperimentConfig(
            name="big_ep",
            data=DataConfig(dim_pose=26, max_motion_length=16, num_joints=4),
            diffusion=DiffusionConfig(num_timesteps=100),
            model=ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                              ff_size=16, num_layers=1, num_heads=2,
                              num_experts=16, text_latent_dim=16,
                              num_random_features=8, text_max_tokens=8,
                              dropout=0.0, stochastic_depth_min=1.0,
                              moe_compute=moe_compute,
                              moe_capacity_factor=capacity_factor,
                              dtype="float32"),
            train=TrainConfig(batch_size=2 * dp, lr=1e-3, uncond_step=False),
        )

    @pytest.mark.slow
    def test_16_experts_ep4_a2a_train_step_matches_dense(self):
        ep = 4
        dp = 8 // ep
        # capacity ceil(S_loc * cf / E) with cf=E covers every token:
        # no drops, so the a2a dispatch path must equal the dense path
        cfg_a2a = self._cfg("dispatch", dp, capacity_factor=16.0)
        cfg_dense = self._cfg("dense", dp, capacity_factor=16.0)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        mesh = make_mesh(8, expert_parallel=ep)

        model_a2a = MotionTransformer(config=cfg_a2a.model, mesh=mesh)
        model_dense = MotionTransformer(config=cfg_dense.model)

        rng = np.random.default_rng(0)
        batch = {
            "motion": rng.standard_normal((2 * dp, 16, 26)).astype(np.float32),
            "length": np.full((2 * dp,), 16, np.int32),
            "text_ids": np.ones((2 * dp, 8), np.int32),
            "t": (np.arange(2 * dp) * 13 % 100).astype(np.int32),
            "t_weight": np.ones((2 * dp,), np.float32),
        }
        results = {}
        for name, model, cfg in (("a2a", model_a2a, cfg_a2a),
                                 ("dense", model_dense, cfg_dense)):
            # fresh identically-seeded state per path: the sharded step
            # donates its input buffers, which can alias a reused host tree
            state = create_train_state(model, cfg, jax.random.key(0))
            raw = make_train_step(model, sched, cfg, jit=False)
            with mesh:
                step, sstate = make_sharded_train_step(raw, state, mesh)
                # expert weights actually sharded 4-ways in both paths
                w1 = sstate.params["params"]["block_low_0"]["ffn"][
                    "branch_0_moe"]["w1"]
                assert w1.sharding.spec[0] == "expert"
                new_state, metrics = step(sstate, shard_batch(batch, mesh),
                                          jax.random.key(1))
            loss = float(metrics["loss_total"])
            assert np.isfinite(loss)
            new_w1 = np.asarray(new_state.params["params"]["block_low_0"][
                "ffn"]["branch_0_moe"]["w1"])
            results[name] = (loss, new_w1)

        # same loss AND same updated expert weights: the all-to-all layout
        # is a layout, not a semantic
        assert abs(results["a2a"][0] - results["dense"][0]) < 1e-5, results
        np.testing.assert_allclose(results["a2a"][1], results["dense"][1],
                                   atol=1e-5)

    def test_moe_big_preset_shape(self):
        cfg = ExperimentConfig.moe_big()
        assert cfg.model.num_experts == 16
        assert cfg.model.latent_dim == 768
        assert cfg.parallel.num_expert_partitions == 8
