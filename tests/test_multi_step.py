"""Scanned multi-step training (make_multi_train_step + Trainer
steps_per_call): K optimizer steps per compiled call must be numerically
IDENTICAL to K sequential single-step calls with the same key schedule.
"""

import dataclasses

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
from motiondiffusion_moe_tpu.diffusion.gaussian import make_schedule
from motiondiffusion_moe_tpu.models import MotionTransformer
from motiondiffusion_moe_tpu.training.train_state import (
    create_train_state,
    make_multi_train_step,
    make_train_step,
)


def _cfg(**train_kw):
    return ExperimentConfig(
        name="multi_step",
        data=DataConfig(dim_pose=26, max_motion_length=16,
                        min_motion_length=8, num_joints=4),
        diffusion=DiffusionConfig(num_timesteps=50),
        model=ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=16, num_layers=1, num_heads=2,
                          num_experts=4, text_latent_dim=16,
                          num_random_features=8, text_max_tokens=8,
                          dropout=0.0, stochastic_depth_min=1.0,
                          dtype="float32"),
        train=TrainConfig(batch_size=4, lr=1e-3, **train_kw),
    )


def _batch(i, B=4):
    rng = np.random.default_rng(i)
    return {
        "motion": jnp.asarray(
            rng.standard_normal((B, 16, 26)).astype(np.float32)),
        "length": jnp.full((B,), 16, jnp.int32),
        "text_ids": jnp.asarray(rng.integers(1, 100, (B, 8)), jnp.int32),
        "t": jnp.asarray(rng.integers(0, 50, (B,)), jnp.int32),
        "t_weight": jnp.ones((B,), jnp.float32),
    }


@pytest.mark.slow
def test_multi_step_matches_sequential():
    cfg = _cfg(uncond_step=False)
    model = MotionTransformer(config=cfg.model)
    sched = make_schedule(schedule_name="linear", num_timesteps=50)
    K = 3
    chunks = [_batch(i) for i in range(K)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *chunks)
    key = jax.random.key(9)

    state0 = create_train_state(model, cfg, jax.random.key(0))
    multi = make_multi_train_step(model, sched, cfg)
    state_m, metrics_m = multi(state0, stacked, key)
    assert int(state_m.step) == K

    # same key schedule, sequential single steps
    state0 = create_train_state(model, cfg, jax.random.key(0))
    step = make_train_step(model, sched, cfg)
    r = key
    seq_losses = []
    state_s = state0
    for i in range(K):
        r, k = jax.random.split(r)
        state_s, m = step(state_s, chunks[i], k)
        seq_losses.append(float(m["loss_total"]))

    np.testing.assert_allclose(np.asarray(metrics_m["loss_total"]),
                               np.asarray(seq_losses), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(state_m.params),
                    jax.tree_util.tree_leaves(state_s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_loader_worker_exception_propagates():
    """A crash in the DataLoader's prefetch thread must raise in the
    consumer, not deadlock the train loop on queue.get() forever (this
    exact deadlock shipped: an invalid dataset config hung fit())."""
    from motiondiffusion_moe_tpu.data import DataLoader

    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise ValueError("boom in worker")

    loader = DataLoader(Boom(), batch_size=4, seed=0)
    with pytest.raises(ValueError, match="boom in worker"):
        next(iter(loader))


@pytest.mark.slow
def test_trainer_steps_per_call(tmp_path):
    """Trainer with steps_per_call=3 + uncond double-step: same number of
    optimizer steps as the step-per-call trainer, scanned chunks plus a
    single-step remainder flush at epoch end."""
    from motiondiffusion_moe_tpu.data import (
        DataLoader, SyntheticText2MotionDataset)
    from motiondiffusion_moe_tpu.training import Trainer

    cfg = _cfg(uncond_step=True, num_epochs=1, steps_per_call=3,
               log_every=1000, save_latest_every=1000)
    ds = SyntheticText2MotionDataset(cfg.data, size=8, seed=0)
    loader = DataLoader(ds, batch_size=4, seed=0)

    trainer = Trainer(cfg)
    state = trainer.init_state()
    state = trainer.fit(state, loader)
    # 2 loader batches x (cond + uncond) = 4 sub-steps: one scanned chunk
    # of 3 + a remainder of 1
    assert int(state.step) == 4
    assert np.isfinite(
        float(jnp.sum(state.params["params"]["out"]["kernel"])))


@pytest.mark.slow
def test_trainer_steps_per_call_ragged_tail():
    """drop_last=False loaders can emit a smaller final batch; the K-chunk
    buffer must drain through the single-step path instead of crashing on
    the mismatched stack (batches 4,4,2 with K=3)."""
    from motiondiffusion_moe_tpu.data import (
        DataLoader, SyntheticText2MotionDataset)
    from motiondiffusion_moe_tpu.training import Trainer

    cfg = _cfg(uncond_step=False, num_epochs=1, steps_per_call=3,
               log_every=1000, save_latest_every=1000)
    ds = SyntheticText2MotionDataset(cfg.data, size=10, seed=0)
    loader = DataLoader(ds, batch_size=4, seed=0, drop_last=False)

    trainer = Trainer(cfg)
    state = trainer.init_state()
    state = trainer.fit(state, loader)
    # 3 loader batches (4, 4, 2): the ragged tail forces a drain of the
    # two buffered full batches, then flushes itself at epoch end
    assert int(state.step) == 3
    assert np.isfinite(
        float(jnp.sum(state.params["params"]["out"]["kernel"])))


@pytest.mark.slow
def test_loss_aware_sampler_forces_single_step():
    """Loss-aware schedule samplers draw each sub-batch's t from weights
    updated after EVERY step; steps_per_call>1 would sample from up-to-K-
    steps-stale weights, so the trainer must fall back to 1 step/call."""
    import dataclasses as _dc

    from motiondiffusion_moe_tpu.data import (
        DataLoader, SyntheticText2MotionDataset)
    from motiondiffusion_moe_tpu.training import Trainer

    cfg = _cfg(uncond_step=False, num_epochs=2, steps_per_call=8,
               log_every=1000, save_latest_every=1000)
    cfg = _dc.replace(cfg, diffusion=_dc.replace(
        cfg.diffusion, schedule_sampler="loss-second-moment"))
    ds = SyntheticText2MotionDataset(cfg.data, size=4, seed=0)
    loader = DataLoader(ds, batch_size=4, seed=0)

    trainer = Trainer(cfg)
    state = trainer.init_state()
    state = trainer.fit(state, loader)
    # with K forced to 1 every batch steps immediately (no buffering):
    # 2 epochs x 1 batch = 2 steps, and the sampler saw every loss
    assert int(state.step) == 2
    assert trainer.sampler._loss_counts.sum() > 0
