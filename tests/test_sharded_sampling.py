"""Data-parallel sharded sampling on the 8-device mesh: the generation
scan under a mesh with the batch sharded over 'data' must produce the same
motions as the unsharded run (SPMD is a layout, not a semantic)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from motiondiffusion_moe_tpu.config import (
    DataConfig,
    DiffusionConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from motiondiffusion_moe_tpu.diffusion.gaussian import make_schedule
from motiondiffusion_moe_tpu.diffusion.sampling import ddpm_sample_loop_cfg
from motiondiffusion_moe_tpu.models import MotionTransformer
from motiondiffusion_moe_tpu.parallel import make_mesh
from motiondiffusion_moe_tpu.parallel.mesh import DATA_AXIS


@pytest.fixture(scope="module")
def setup():
    cfg = ExperimentConfig(
        name="shard_sample",
        data=DataConfig(dim_pose=26, max_motion_length=16, num_joints=4),
        diffusion=DiffusionConfig(num_timesteps=100),
        model=ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=16, num_layers=1, num_heads=2,
                          num_experts=4, text_latent_dim=16,
                          num_random_features=8, text_max_tokens=8,
                          dropout=0.0, stochastic_depth_min=1.0,
                          dtype="float32"),
        train=TrainConfig(batch_size=8),
    )
    model = MotionTransformer(config=cfg.model)
    ids = jnp.ones((16, 8), jnp.int32)  # doubled batch 8 cond + 8 uncond
    x = jnp.zeros((16, 16, 26))
    t = jnp.zeros((16,), jnp.int32)
    length = jnp.full((16,), 16, jnp.int32)
    params = model.init({"params": jax.random.key(0)}, x, t, length,
                        text_ids=ids)
    sched = make_schedule(schedule_name="linear", num_timesteps=100)

    def model_doubled(x2, t2):
        return model.apply(params, x2, t2, jnp.full((x2.shape[0],), 16),
                           text_ids=jnp.ones((x2.shape[0], 8), jnp.int32),
                           mutable=["moe_losses", "moe_metrics"])[0]

    return sched, model_doubled


@pytest.mark.slow
def test_dp_sharded_sampling_matches_unsharded(setup):
    sched, model_doubled = setup
    noise = jax.random.normal(jax.random.key(1), (8, 16, 26))
    rng = jax.random.key(2)

    fn = lambda n, r: ddpm_sample_loop_cfg(sched, model_doubled, n, r,
                                           guidance_scale=7.5)
    ref = jax.jit(fn)(noise, rng)

    mesh = make_mesh(8, expert_parallel=1)
    with mesh:
        batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
        noise_s = jax.device_put(noise, batch_sharding)
        sharded = jax.jit(fn, in_shardings=(batch_sharding, None),
                          out_shardings=batch_sharding)(noise_s, rng)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               atol=2e-4)


@pytest.mark.slow
def test_dp_ep_tp_sharded_sampling_matches_unsharded(setup):
    """The full 3-axis mesh (data=2, expert=2, model=2): batch sharded over
    'data', expert weights over 'expert', FFN hidden dims over 'model' —
    the sampling scan still reproduces the unsharded motions."""
    from motiondiffusion_moe_tpu.parallel import param_shardings

    sched, model_doubled = setup
    noise = jax.random.normal(jax.random.key(1), (8, 16, 26))
    rng = jax.random.key(2)

    fn = lambda n, r: ddpm_sample_loop_cfg(sched, model_doubled, n, r,
                                           guidance_scale=7.5)
    ref = jax.jit(fn)(noise, rng)

    mesh = make_mesh(8, expert_parallel=2, tensor_parallel=2)
    with mesh:
        batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
        noise_s = jax.device_put(noise, batch_sharding)
        # params are closed over by model_doubled; the partitioner
        # propagates shardings from the batch + the closure constants
        sharded = jax.jit(fn, in_shardings=(batch_sharding, None),
                          out_shardings=batch_sharding)(noise_s, rng)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               atol=2e-4)
