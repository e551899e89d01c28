"""Training-step and trainer tests, including the overfit-one-batch e2e
check (SURVEY.md §4 implication (d))."""

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
from motiondiffusion_moe_tpu.data import (
    DataLoader,
    DistributedSampler,
    SyntheticText2MotionDataset,
)
from motiondiffusion_moe_tpu.diffusion.gaussian import make_schedule
from motiondiffusion_moe_tpu.models import MotionTransformer
from motiondiffusion_moe_tpu.training import (
    CheckpointManager,
    Trainer,
    acceleration_loss,
    create_train_state,
    make_train_step,
    masked_frame_mse,
    progressive_loss,
    structure_loss,
    velocity_loss,
)


def tiny_config(**model_kw) -> ExperimentConfig:
    return ExperimentConfig(
        name="tiny",
        data=DataConfig(dim_pose=26, max_motion_length=16,
                        min_motion_length=8, num_joints=4),
        diffusion=DiffusionConfig(num_timesteps=50),
        model=ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=16, num_layers=1, num_heads=2,
                          num_experts=4, text_latent_dim=16,
                          num_random_features=8, text_max_tokens=8,
                          dropout=0.0, stochastic_depth_min=1.0,
                          dtype="float32", **model_kw),
        train=TrainConfig(batch_size=4, lr=1e-3, uncond_step=False),
    )


class TestLosses:
    def test_masked_mse_ignores_padding(self):
        pred = jnp.ones((2, 4, 3))
        target = jnp.zeros((2, 4, 3))
        target = target.at[:, 2:].set(100.0)  # wrong only in padded frames
        mask = jnp.asarray([[1, 1, 0, 0], [1, 1, 0, 0]], jnp.float32)
        loss = masked_frame_mse(pred, target, mask)
        assert float(loss) == pytest.approx(1.0)

    def test_masked_mse_importance_weights(self):
        """All-ones weights == unweighted (reference parity); non-uniform
        weights scale each sample's numerator contribution."""
        rng = jax.random.key(1)
        pred = jax.random.normal(rng, (3, 4, 5))
        target = jnp.zeros((3, 4, 5))
        mask = jnp.asarray(
            [[1, 1, 1, 0], [1, 1, 0, 0], [1, 1, 1, 1]], jnp.float32)
        base = masked_frame_mse(pred, target, mask)
        ones = masked_frame_mse(pred, target, mask,
                                sample_weight=jnp.ones((3,)))
        assert float(ones) == pytest.approx(float(base), rel=1e-7)
        w = jnp.asarray([2.0, 0.5, 1.0])
        weighted = masked_frame_mse(pred, target, mask, sample_weight=w)
        per_frame = jnp.mean(pred ** 2, axis=-1)
        expect = jnp.sum(per_frame * w[:, None] * mask) / jnp.sum(mask)
        assert float(weighted) == pytest.approx(float(expect), rel=1e-6)

    def test_velocity_loss_zero_for_equal(self):
        x = jax.random.normal(jax.random.key(0), (2, 8, 6))
        mask = jnp.ones((2, 8))
        assert float(velocity_loss(x, x, mask)) == 0.0
        assert float(acceleration_loss(x, x, mask)) == 0.0
        assert float(progressive_loss(x, x, mask)) == 0.0

    def test_velocity_detects_temporal_noise(self):
        """Constant offset has zero velocity loss; frame-alternating noise
        does not."""
        x = jax.random.normal(jax.random.key(0), (1, 8, 6))
        mask = jnp.ones((1, 8))
        offset = x + 5.0
        assert float(velocity_loss(offset, x, mask)) == pytest.approx(0.0, abs=1e-9)
        jitter = x + jnp.arange(8.0)[None, :, None] % 2
        assert float(velocity_loss(jitter, x, mask)) > 0.1

    def test_structure_loss(self):
        D = 1 + 2 + 1 + 3 * 3 + 3 * 6 + 4 * 3 + 4  # 4 joints -> 52
        x = jax.random.normal(jax.random.key(0), (1, 6, D)) * 0.1
        mask = jnp.ones((1, 6))
        assert float(structure_loss(x, x, mask, 4)) == 0.0
        y = x * 2.0
        assert float(structure_loss(y, x, mask, 4)) > 0


class TestGroupedGlobalNorm:
    """The grouped global-norm clip (one reduce over concatenated small
    leaves) must match optax.clip_by_global_norm up to reassociation."""

    def _tree(self, scale):
        keys = jax.random.split(jax.random.key(7), 5)
        return {
            "big": jax.random.normal(keys[0], (512, 1024)) * scale,
            "bias": jax.random.normal(keys[1], (7,)) * scale,
            "nested": {"ln": jax.random.normal(keys[2], (512,)) * scale,
                       "w": jax.random.normal(keys[3], (2048, 512)) * scale},
            "tiny": jax.random.normal(keys[4], (3, 5)) * scale,
        }

    def test_norm_matches_optax(self):
        import optax

        from motiondiffusion_moe_tpu.training.train_state import (
            grouped_global_norm)

        tree = self._tree(3.0)
        ref = float(optax.global_norm(tree))
        got = float(grouped_global_norm(tree, small_leaf_elems=1024))
        assert abs(ref - got) < 1e-3 * ref

    @pytest.mark.parametrize("scale", [3.0, 1e-4])  # clip / no-clip regimes
    def test_clip_matches_optax(self, scale):
        import optax

        from motiondiffusion_moe_tpu.training.train_state import (
            clip_by_grouped_global_norm)

        tree = self._tree(scale)
        ref, _ = optax.clip_by_global_norm(1.0).update(
            tree, optax.EmptyState())
        got, _ = clip_by_grouped_global_norm(1.0, 1024).update(
            tree, optax.EmptyState())
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6,
                                                    atol=1e-8), ref, got)

    def test_clip_impl_env_knob(self, monkeypatch):
        """GRAD_CLIP_IMPL=plain (the chip A/B knob) swaps in optax's
        per-leaf clip; one optimizer update matches the grouped default
        up to reassociation."""
        from motiondiffusion_moe_tpu.config import ExperimentConfig
        from motiondiffusion_moe_tpu.training.train_state import (
            make_optimizer)

        cfg = ExperimentConfig()
        grads = self._tree(3.0)
        params = jax.tree_util.tree_map(jnp.zeros_like, grads)

        def one_update():
            tx = make_optimizer(cfg)
            upd, _ = tx.update(grads, tx.init(params), params)
            return upd

        default = one_update()
        monkeypatch.setenv("GRAD_CLIP_IMPL", "plain")
        plain = one_update()
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-5,
                                                    atol=1e-8),
            default, plain)


class TestTrainStep:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = tiny_config()
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear",
                              num_timesteps=cfg.diffusion.num_timesteps)
        # NOTE: the train step donates the state buffers (in-place param
        # update on TPU), so each test builds a fresh state.
        make_state = lambda: create_train_state(model, cfg, jax.random.key(0))
        step = make_train_step(model, sched, cfg)
        batch = {
            "motion": jax.random.normal(jax.random.key(1), (4, 16, 26)) * 0.5,
            "length": jnp.asarray([16, 12, 16, 9]),
            "text_ids": jnp.ones((4, 8), jnp.int32),
            "t": jnp.asarray([0, 10, 25, 49]),
            "t_weight": jnp.ones((4,)),
        }
        return cfg, make_state, step, batch

    @pytest.mark.slow
    def test_step_runs_and_updates(self, setup):
        _, make_state, step, batch = setup
        state = make_state()
        params_before = jax.device_get(state.params)
        new_state, metrics = step(state, batch, jax.random.key(2))
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss_total"]))
        assert float(metrics["grad_norm"]) > 0
        # params actually changed
        diff = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            params_before, jax.device_get(new_state.params))
        assert max(jax.tree_util.tree_leaves(diff)) > 0

    @pytest.mark.slow
    def test_loss_decreases_overfit_one_batch(self, setup):
        """End-to-end: with a FIXED rng (same noise and t each step) the
        denoiser memorizes the mapping and the loss falls fast."""
        _, make_state, step, batch = setup
        state = make_state()
        k = jax.random.key(3)
        first = None
        last = None
        for i in range(50):
            state, metrics = step(state, batch, k)
            if first is None:
                first = float(metrics["loss_mot_rec"])
            last = float(metrics["loss_mot_rec"])
        assert last < first * 0.6, (first, last)

    @pytest.mark.slow
    def test_advanced_losses_run(self):
        cfg = tiny_config()
        cfg = ExperimentConfig(
            name=cfg.name, data=cfg.data, diffusion=cfg.diffusion,
            model=cfg.model,
            train=TrainConfig(batch_size=4, lr=1e-3, uncond_step=False,
                              w_velocity=0.5, w_acceleration=0.25,
                              w_structure=0.1, w_progressive=0.5))
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear", num_timesteps=50)
        state = create_train_state(model, cfg, jax.random.key(0))
        D = 26
        step = make_train_step(model, sched, cfg,
                               normalizer_stats=(np.zeros(D), np.ones(D)))
        batch = {
            "motion": jax.random.normal(jax.random.key(1), (4, 16, 26)) * 0.5,
            "length": jnp.full((4,), 16),
            "text_ids": jnp.ones((4, 8), jnp.int32),
            "t": jnp.asarray([0, 10, 25, 49]),
            "t_weight": jnp.ones((4,)),
        }
        _, metrics = step(state, batch, jax.random.key(2))
        for k in ("loss_velocity", "loss_acceleration", "loss_structure",
                  "loss_progressive"):
            assert np.isfinite(float(metrics[k])), k


class TestAdamCompact:
    """scale_by_adam_compact (both moment dtypes selectable) must equal
    optax.scale_by_adam in f32/f32 and stay close with bf16 moments."""

    def _grads(self, i):
        keys = jax.random.split(jax.random.key(100 + i), 2)
        return {"w": jax.random.normal(keys[0], (64, 32)) * 0.1,
                "b": jax.random.normal(keys[1], (32,)) * 0.1}

    def test_f32_matches_optax(self):
        import optax

        from motiondiffusion_moe_tpu.training.train_state import (
            scale_by_adam_compact)

        params = self._grads(999)
        ours, ref = scale_by_adam_compact(), optax.scale_by_adam()
        s_o, s_r = ours.init(params), ref.init(params)
        for i in range(5):
            g = self._grads(i)
            u_o, s_o = ours.update(g, s_o)
            u_r, s_r = ref.update(g, s_r)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6,
                                                        atol=1e-8),
                u_o, u_r)

    def test_bf16_nu_close_and_compact(self):
        import optax

        from motiondiffusion_moe_tpu.training.train_state import (
            scale_by_adam_compact)

        params = self._grads(999)
        ours = scale_by_adam_compact(mu_dtype=jnp.bfloat16,
                                     nu_dtype=jnp.bfloat16)
        ref = optax.scale_by_adam()
        s_o, s_r = ours.init(params), ref.init(params)
        assert s_o.nu["w"].dtype == jnp.bfloat16
        assert s_o.mu["w"].dtype == jnp.bfloat16
        for i in range(10):
            g = self._grads(i)
            u_o, s_o = ours.update(g, s_o)
            u_r, s_r = ref.update(g, s_r)
        # bf16 moment rounding: updates stay within ~2% of f32 Adam
        for a, b in zip(jax.tree_util.tree_leaves(u_o),
                        jax.tree_util.tree_leaves(u_r)):
            denom = np.abs(np.asarray(b)).mean()
            assert np.abs(np.asarray(a) - np.asarray(b)).mean() < 0.02 * denom

    @pytest.mark.slow
    def test_train_step_runs_with_compact_adam(self):
        import dataclasses as _dc

        cfg = tiny_config()
        cfg = _dc.replace(cfg, train=_dc.replace(
            cfg.train, adam_mu_dtype="bfloat16", adam_nu_dtype="bfloat16"))
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear",
                              num_timesteps=cfg.diffusion.num_timesteps)
        state = create_train_state(model, cfg, jax.random.key(0))
        step = make_train_step(model, sched, cfg)
        batch = {
            "motion": jax.random.normal(jax.random.key(1), (2, 16, 26)) * 0.5,
            "length": jnp.asarray([16, 12]),
            "text_ids": jnp.ones((2, 8), jnp.int32),
            "t": jnp.asarray([3, 40]),
            "t_weight": jnp.ones((2,)),
        }
        new_state, metrics = step(state, batch, jax.random.key(2))
        assert np.isfinite(float(metrics["loss_total"]))
        assert int(new_state.step) == 1


class TestRematBlocks:
    """remat_blocks wraps decoder blocks in nn.remat (static_argnums for
    `deterministic`, named-save policy for the favor kernels); the
    rematerialized backward must reproduce the plain backward."""

    @pytest.mark.slow
    @pytest.mark.parametrize("policy", ["dots_named", "all"])
    def test_remat_train_step_matches_plain(self, policy):
        import dataclasses as _dc

        cfg = tiny_config()
        sched = make_schedule(schedule_name="linear",
                              num_timesteps=cfg.diffusion.num_timesteps)
        batch = {
            "motion": jax.random.normal(jax.random.key(1), (2, 16, 26)) * 0.5,
            "length": jnp.asarray([16, 12]),
            "text_ids": jnp.ones((2, 8), jnp.int32),
            "t": jnp.asarray([3, 40]),
            "t_weight": jnp.ones((2,)),
        }

        def one_step(c):
            model = MotionTransformer(config=c.model)
            state = create_train_state(model, c, jax.random.key(0))
            step = make_train_step(model, sched, c)
            new_state, metrics = step(state, batch, jax.random.key(2))
            return new_state, metrics

        base_state, base_m = one_step(cfg)
        remat_cfg = _dc.replace(
            cfg, model=_dc.replace(cfg.model, remat_blocks=policy))
        remat_state, remat_m = one_step(remat_cfg)

        np.testing.assert_allclose(float(remat_m["loss_total"]),
                                   float(base_m["loss_total"]), atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(base_state.params),
                        jax.tree_util.tree_leaves(remat_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)

    def test_invalid_remat_value_raises(self):
        import dataclasses as _dc

        cfg = tiny_config()
        bad = _dc.replace(cfg, model=_dc.replace(cfg.model,
                                                 remat_blocks="dot"))
        model = MotionTransformer(config=bad.model)
        x = jnp.zeros((1, 16, 26))
        t = jnp.zeros((1,), jnp.int32)
        with pytest.raises(ValueError, match="remat_blocks"):
            model.init(jax.random.key(0), x, t, jnp.full((1,), 16),
                       text_ids=jnp.ones((1, 8), jnp.int32))


class TestTrainerLoop:
    @pytest.mark.slow
    def test_fit_runs_epochs(self, tmp_path):
        cfg = tiny_config()
        ds = SyntheticText2MotionDataset(cfg.data, size=8, seed=0)
        loader = DataLoader(ds, batch_size=4, seed=0)
        trainer = Trainer(cfg)
        state = trainer.init_state()
        cfg2 = ExperimentConfig(
            name=cfg.name, data=cfg.data, diffusion=cfg.diffusion,
            model=cfg.model,
            train=TrainConfig(batch_size=4, num_epochs=2, lr=1e-3,
                              uncond_step=True, log_every=2))
        trainer.cfg = cfg2
        state = trainer.fit(state, loader)
        # 2 epochs x 2 batches x 2 steps (cond+uncond)
        assert int(state.step) == 8

    @pytest.mark.slow
    def test_resume_from_epoch_boundary_runs_remaining_epochs(
            self, tmp_path):
        """A cadence save landing exactly on an epoch's final step stores
        the in-progress epoch, and orbax silently skips the end-of-epoch
        duplicate — without the epoch-completion sidecar a resume re-ran
        the whole completed epoch (round-5 soak: save_latest=512 aligned
        with a 512-step epoch; the resumed run trained 1536 steps where
        num_epochs=2 promised 1024)."""
        cfg = tiny_config()
        import dataclasses as _dc
        cfg = _dc.replace(cfg, train=_dc.replace(
            cfg.train, num_epochs=1, uncond_step=False,
            save_latest_every=1))  # cadence aligns with the 1-step epoch
        ds = SyntheticText2MotionDataset(cfg.data, size=4, seed=0)
        loader = DataLoader(ds, batch_size=4, seed=0)
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        trainer = Trainer(cfg)
        trainer.fit(trainer.init_state(), loader, checkpoints=mngr)
        mngr.wait()
        assert mngr.latest_step() == 1

        cfg2 = _dc.replace(cfg, train=_dc.replace(cfg.train, num_epochs=2))
        trainer2 = Trainer(cfg2)
        mngr2 = CheckpointManager(str(tmp_path / "ckpt"))
        final = trainer2.fit(trainer2.init_state(), loader,
                             checkpoints=mngr2)
        mngr2.close()
        # exactly ONE more epoch (1 step), not a re-run of epoch 0 too
        assert int(final.step) == 2

    @pytest.mark.slow
    def test_resume_frees_template_state(self, tmp_path):
        """fit() owns the passed-in state: on resume the init template's
        device buffers must be FREED, not pinned by the caller's frame —
        at flagship scale the pinned template (~5.8 GB of f32
        params+moments+EMA) plus the restored state OOMed a 16 GB chip
        that the same fresh run fits on (round-4 soak, .soak/soak2.log)."""
        cfg = tiny_config()
        import dataclasses as _dc
        cfg = _dc.replace(cfg, train=_dc.replace(
            cfg.train, num_epochs=1, uncond_step=False, ema_decay=0.9,
            save_latest_every=1))
        ds = SyntheticText2MotionDataset(cfg.data, size=4, seed=0)
        loader = DataLoader(ds, batch_size=4, seed=0)
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        trainer = Trainer(cfg)
        trainer.fit(trainer.init_state(), loader, checkpoints=mngr)
        mngr.wait()

        cfg2 = _dc.replace(cfg, train=_dc.replace(cfg.train, num_epochs=2))
        trainer2 = Trainer(cfg2)
        template = trainer2.init_state()
        mngr2 = CheckpointManager(str(tmp_path / "ckpt"))
        final = trainer2.fit(template, loader, checkpoints=mngr2)
        mngr2.close()
        # the template's buffers were freed by the restore, even though
        # this frame still references the object
        leaves = [l for l in jax.tree_util.tree_leaves(template)
                  if isinstance(l, jax.Array)]
        assert leaves and all(l.is_deleted() for l in leaves)
        # the returned (resumed+trained) state is alive and advanced
        assert int(final.step) > 1
        assert all(not l.is_deleted()
                   for l in jax.tree_util.tree_leaves(final)
                   if isinstance(l, jax.Array))

    @pytest.mark.slow
    def test_loss_aware_sampler_integration(self):
        cfg = tiny_config()
        object.__setattr__(cfg.diffusion, "schedule_sampler", "loss-second-moment")
        ds = SyntheticText2MotionDataset(cfg.data, size=4, seed=0)
        loader = DataLoader(ds, batch_size=4, seed=0)
        trainer = Trainer(cfg)
        state = trainer.init_state()
        state = trainer.fit(state, loader)
        # history got updated
        assert trainer.sampler._loss_counts.sum() > 0


class TestDistributedSampler:
    def test_equal_per_rank_counts(self):
        for n in (10, 16, 7):
            samplers = [DistributedSampler(n, num_replicas=4, rank=r)
                        for r in range(4)]
            counts = [len(list(iter(s))) for s in samplers]
            assert len(set(counts)) == 1  # round-up padding -> equal

    def test_all_indices_covered(self):
        n = 10
        seen = set()
        for r in range(4):
            s = DistributedSampler(n, num_replicas=4, rank=r, shuffle=False)
            seen.update(iter(s))
        assert seen == set(range(n))

    def test_epoch_changes_order(self):
        s = DistributedSampler(32, num_replicas=1, rank=0, shuffle=True)
        s.set_epoch(0)
        a = list(iter(s))
        s.set_epoch(1)
        b = list(iter(s))
        assert a != b
        s.set_epoch(0)
        assert list(iter(s)) == a  # deterministic per epoch

    def test_dataset_smaller_than_replicas(self):
        """Round-up padding must TILE when dataset_len < num_replicas
        (a single wrap under-pads and crashed the length assert)."""
        for n, reps in ((1, 4), (2, 8), (3, 4)):
            samplers = [DistributedSampler(n, num_replicas=reps, rank=r)
                        for r in range(reps)]
            counts = [len(list(iter(s))) for s in samplers]
            assert counts == [1] * reps
            seen = set()
            for s in samplers:
                seen.update(iter(s))
            assert seen <= set(range(n))

    def test_abandoned_iteration_stops_prefetch_thread(self):
        """A steps-capped loop abandons the loader iterator mid-epoch; the
        prefetch thread must exit instead of blocking in q.put forever."""
        import threading
        import time as _time

        from motiondiffusion_moe_tpu.config import DataConfig

        ds = SyntheticText2MotionDataset(
            DataConfig(dim_pose=8, max_motion_length=16,
                       min_motion_length=8, num_joints=2), size=64, seed=0)
        loader = DataLoader(ds, batch_size=4, seed=0)
        before = threading.active_count()
        for _ in range(3):
            it = iter(loader)
            next(it)
            it.close()  # abandon mid-epoch (as `zip(range(n), loader)` does)
        deadline = _time.time() + 5.0
        while threading.active_count() > before and _time.time() < deadline:
            _time.sleep(0.05)
        assert threading.active_count() <= before, (
            f"{threading.active_count() - before} prefetch thread(s) leaked")


class TestDataset:
    def test_synthetic_deterministic(self):
        cfg = DataConfig(dim_pose=26, max_motion_length=16, min_motion_length=8)
        ds = SyntheticText2MotionDataset(cfg, size=4, seed=1)
        c1, m1, l1 = ds[2]
        c2, m2, l2 = ds[2]
        assert c1 == c2 and l1 == l2
        np.testing.assert_array_equal(m1, m2)
        assert m1.shape == (16, 26)
        assert 8 <= l1 <= 16

    def test_loader_shapes(self):
        cfg = DataConfig(dim_pose=26, max_motion_length=16, min_motion_length=8)
        ds = SyntheticText2MotionDataset(cfg, size=10, seed=1)
        loader = DataLoader(ds, batch_size=4, drop_last=True)
        batches = list(iter(loader))
        assert len(batches) == len(loader)
        captions, motions, lengths = batches[0]
        assert motions.shape == (4, 16, 26)
        assert motions.dtype == np.float32
        assert lengths.dtype == np.int32
        assert len(captions) == 4


class TestEMAAndLRSchedule:
    """Weight EMA (TrainConfig.ema_decay) and LR schedules — our additions
    beyond the reference's fixed-lr, no-EMA recipe (train_options.py:14)."""

    def _setup(self, **train_kw):
        import dataclasses as _dc
        cfg = tiny_config()
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train, **train_kw))
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear",
                              num_timesteps=cfg.diffusion.num_timesteps)
        state = create_train_state(model, cfg, jax.random.key(0))
        step = make_train_step(model, sched, cfg)
        batch = {
            "motion": jax.random.normal(jax.random.key(1), (4, 16, 26)) * 0.5,
            "length": jnp.asarray([16, 12, 16, 9]),
            "text_ids": jnp.ones((4, 8), jnp.int32),
            "t": jnp.asarray([0, 10, 25, 49]),
            "t_weight": jnp.ones((4,)),
        }
        return cfg, state, step, batch

    @pytest.mark.slow
    def test_ema_tracks_params(self):
        """ema_{k+1} = d*ema_k + (1-d)*params_{k+1}, ema_0 = params_0."""
        d = 0.5
        _, state, step, batch = self._setup(ema_decay=d)
        assert state.ema_params is not None
        # EMA covers exactly the 'params' collection (not sown aux)
        assert set(state.ema_params.keys()) == {"params"}
        ema = jax.device_get(state.ema_params["params"])
        for i in range(2):
            state, _ = step(state, batch, jax.random.key(10 + i))
            p = jax.device_get(state.params["params"])
            ema = jax.tree_util.tree_map(
                lambda e, q: d * e + (1 - d) * q, ema, p)
            got = jax.device_get(state.ema_params["params"])
            for a, b in zip(jax.tree_util.tree_leaves(ema),
                            jax.tree_util.tree_leaves(got)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-6, atol=1e-7)
        # EMA lags the raw weights (it still holds mass on the init point)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            jax.device_get(state.params["params"]),
            jax.device_get(state.ema_params["params"]))
        assert max(jax.tree_util.tree_leaves(diffs)) > 0

    @pytest.mark.slow
    def test_ema_checkpoint_roundtrip(self, tmp_path):
        _, state, step, batch = self._setup(ema_decay=0.9)
        state, _ = step(state, batch, jax.random.key(5))
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(1, state, epoch=0)
        mngr.wait()
        _, template, _, _ = self._setup(ema_decay=0.9)
        restored, _ = mngr.restore(template)
        mngr.close()
        for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                        jax.tree_util.tree_leaves(restored.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_ema_dropped_on_resume_without_flag_warns(self, tmp_path, capsys):
        """Resuming an EMA run with ema_decay=0 must not be silent: the
        accumulated EMA weights are discarded, and the user is told."""
        _, state, step, batch = self._setup(ema_decay=0.9)
        state, _ = step(state, batch, jax.random.key(5))
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(1, state, epoch=0)
        mngr.wait()
        _, template, _, _ = self._setup()  # ema off
        assert template.ema_params is None
        restored, _ = mngr.restore(template)
        mngr.close()
        assert restored.ema_params is None
        assert "EMA weights are DROPPED" in capsys.readouterr().out
        # the raw weights still restore exactly
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_epoch_sidecar_overrides_duplicate_step_save(self, tmp_path):
        """orbax skips a second save at an existing step, so an
        end-of-epoch save can't overwrite a boundary-aligned cadence
        save's in-progress epoch — the sidecar marker must carry the
        epoch+1 instead, per step."""
        _, state, step, batch = self._setup()
        state, _ = step(state, batch, jax.random.key(3))
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(1, state, epoch=0, rng=jax.random.key(0))
        mngr.save(1, state, epoch=1, rng=jax.random.key(0))  # skipped
        mngr.wait()
        _, template, _, _ = self._setup()
        _, ep = mngr.restore(template)
        assert ep == 0  # duplicate save silently lost the epoch bump
        mngr.mark_epoch_complete(1, 1)
        _, template, _, _ = self._setup()
        _, ep = mngr.restore(template)
        assert ep == 1  # sidecar wins for its step
        # other steps are unaffected by the marker
        state2, _ = step(state, batch, jax.random.key(4))
        mngr.save(2, state2, epoch=1, rng=jax.random.key(0))
        mngr.wait()
        _, template, _, _ = self._setup()
        _, ep = mngr.restore(template)  # latest = step 2
        assert ep == 1
        mngr.close()

    def test_select_params_ema_is_full_variables_dict(self):
        """select_params(use_ema=True) must be a drop-in for .params:
        same collections, with only 'params' swapped for the EMA tree."""
        from motiondiffusion_moe_tpu.training import select_params
        _, state, _, _ = self._setup(ema_decay=0.9)
        out = select_params(state, use_ema=True)
        assert set(out.keys()) == set(state.params.keys())
        assert out["params"] is state.ema_params["params"]

    @pytest.mark.slow
    def test_restore_mismatch_error_carries_detail(self, tmp_path):
        """A resume whose template diverges structurally from the saved run
        (here: adding an lr schedule, which grows the opt_state) must
        surface the underlying orbax errors, not an opaque one-liner."""
        _, state, step, batch = self._setup()
        state, _ = step(state, batch, jax.random.key(3))
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(1, state, epoch=0)
        mngr.wait()
        _, template, _, _ = self._setup(lr_warmup_steps=7)
        with pytest.raises(ValueError, match="Per-layout errors"):
            mngr.restore(template)
        mngr.close()

    @pytest.mark.slow
    def test_lr_warmup_first_step_is_noop(self):
        """linear 0 -> lr warmup: the first update is scaled by lr(0)=0."""
        _, state, step, batch = self._setup(lr_warmup_steps=3)
        before = jax.device_get(state.params)
        state, _ = step(state, batch, jax.random.key(6))
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(
                            jax.device_get(state.params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        state, _ = step(state, batch, jax.random.key(7))
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            before, jax.device_get(state.params))
        assert max(jax.tree_util.tree_leaves(diffs)) > 0

    def test_no_ema_by_default_and_select_params(self):
        from motiondiffusion_moe_tpu.training import select_params
        cfg = tiny_config()
        model = MotionTransformer(config=cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0))
        assert state.ema_params is None
        assert select_params(state) is state.params
        with pytest.raises(ValueError, match="ema_decay"):
            select_params(state, use_ema=True)

    def test_cosine_requires_decay_steps(self):
        import dataclasses as _dc
        from motiondiffusion_moe_tpu.training.train_state import make_lr
        cfg = tiny_config()
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train,
                                                 lr_schedule="cosine"))
        with pytest.raises(ValueError, match="lr_decay_steps"):
            make_lr(cfg)
        cfg = _dc.replace(cfg, train=_dc.replace(
            cfg.train, lr_schedule="cosine", lr_warmup_steps=10,
            lr_decay_steps=100))
        lr = make_lr(cfg)
        assert float(lr(0)) == 0.0
        np.testing.assert_allclose(float(lr(10)), cfg.train.lr, rtol=1e-6)
        assert float(lr(100)) < 1e-5 * cfg.train.lr


class TestGradAccum:
    """grad_accum_steps: one optimizer update from A sequential
    microbatches (lax.scan), grads averaged. The SGD(1.0) probe makes the
    update equal the raw gradient, so accumulated == mean of per-chunk
    single-step updates is an EXACT equivalence check (same per-chunk rng
    keys by construction: the accum body consumes jax.random.split(rng, A)
    in order)."""

    def _batch(self, B=4):
        return {
            "motion": jax.random.normal(jax.random.key(1), (B, 16, 26)) * 0.5,
            "length": jnp.asarray([16, 12, 16, 9][:B]),
            "text_ids": jnp.ones((B, 8), jnp.int32),
            "t": jnp.asarray([0, 10, 25, 49][:B]),
            "t_weight": jnp.ones((B,)),
        }

    def _sgd_state(self, model, cfg):
        import optax
        from motiondiffusion_moe_tpu.training.train_state import TrainState
        base = create_train_state(model, cfg, jax.random.key(0))
        tx = optax.sgd(1.0)
        return TrainState(step=base.step, params=base.params,
                          opt_state=tx.init(base.params), tx=tx)

    @pytest.mark.slow  # three distinct jit compiles (~5 min on 1 CPU core)
    def test_accum_update_is_mean_of_chunk_grads(self):
        import dataclasses as _dc
        cfg = tiny_config()
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear",
                              num_timesteps=cfg.diffusion.num_timesteps)
        batch = self._batch()
        rng = jax.random.key(7)

        cfg2 = _dc.replace(cfg, train=_dc.replace(cfg.train,
                                                  grad_accum_steps=2))
        accum_step = make_train_step(model, sched, cfg2, jit=False)
        chunked = {k: v.reshape(2, 2, *v.shape[1:]) for k, v in batch.items()}
        s0 = self._sgd_state(model, cfg2)
        p0 = jax.device_get(s0.params)
        s_acc, metrics = jax.jit(accum_step)(s0, chunked, rng)
        assert int(s_acc.step) == 1  # ONE optimizer step from A microbatches
        delta_acc = jax.tree_util.tree_map(
            lambda a, b: np.asarray(a) - np.asarray(b),
            p0, jax.device_get(s_acc.params))

        # reference: single-step grads per chunk, same keys, averaged
        single = make_train_step(model, sched, cfg, jit=False)
        keys = jax.random.split(rng, 2)
        deltas = []
        for i in range(2):
            chunk = {k: v[i] for k, v in chunked.items()}
            si = self._sgd_state(model, cfg)
            pi = jax.device_get(si.params)
            so, _ = jax.jit(single)(si, chunk, keys[i])
            deltas.append(jax.tree_util.tree_map(
                lambda a, b: np.asarray(a) - np.asarray(b),
                pi, jax.device_get(so.params)))
        want = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *deltas)

        for (ka, a), (kw, w) in zip(
                jax.tree_util.tree_leaves_with_path(delta_acc),
                jax.tree_util.tree_leaves_with_path(want)):
            np.testing.assert_allclose(
                a, w, rtol=2e-5, atol=1e-7,
                err_msg=jax.tree_util.keystr(ka))
        # scalar metrics are means over chunks; per-sample stays [B]
        assert metrics["per_sample_mse"].shape == (4,)
        assert np.ndim(metrics["loss_total"]) == 0

    def test_indivisible_batch_raises(self):
        import dataclasses as _dc
        cfg = tiny_config()
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train,
                                                 grad_accum_steps=3))
        with pytest.raises(ValueError, match="divisible"):
            Trainer(cfg)

    def test_microbatch_must_divide_data_axis(self):
        """The sharded array carries ONE microbatch (B/A) on its batch
        axis; validation must check that, not the pre-chunk global batch.
        B=16 A=4 dp=8: 16%8==0 but the microbatch of 4 can't split 8 ways
        — this must fail EARLY with the --grad_accum hint, not as an
        opaque sharding error at step one."""
        import dataclasses as _dc
        cfg = tiny_config()
        cfg = _dc.replace(
            cfg,
            train=_dc.replace(cfg.train, batch_size=16, grad_accum_steps=4),
            parallel=_dc.replace(cfg.parallel, num_data_partitions=8))
        with pytest.raises(ValueError, match="microbatch 4"):
            Trainer(cfg)

    def test_ragged_tail_runs_unaccumulated(self, capsys):
        """A drop_last=False tail that doesn't divide grad_accum_steps
        degrades to ONE unaccumulated update (leading axis 1), not a
        mid-training ValueError."""
        import dataclasses as _dc
        cfg = tiny_config()
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train,
                                                 grad_accum_steps=2))
        trainer = Trainer(cfg)
        ragged = {"motion": jnp.zeros((3, 16, 26)),
                  "length": jnp.full((3,), 16, jnp.int32)}
        out = trainer._chunk(ragged)
        assert out["motion"].shape == (1, 3, 16, 26)
        assert "unaccumulated" in capsys.readouterr().out
        # divisible batches still chunk to [A, B/A, ...]
        full = {"motion": jnp.zeros((4, 16, 26))}
        assert trainer._chunk(full)["motion"].shape == (2, 2, 16, 26)

    @pytest.mark.slow
    def test_trainer_e2e_with_accum(self, tmp_path):
        """Full CLI run with --grad_accum 2 (+ the uncond double step and
        steps_per_call interleavings): completes, saves, loss finite."""
        import json
        import os
        from motiondiffusion_moe_tpu.tools.train import main
        main(["--name", "accum", "--dataset", "synthetic",
              "--synthetic_size", "8", "--checkpoint_dir", str(tmp_path),
              "--batch_size", "4", "--num_epochs", "2", "--num_layers", "2",
              "--latent_dim", "32", "--ff_size", "16", "--num_heads", "2",
              "--num_experts", "4", "--text_latent_dim", "16",
              "--diffusion_steps", "50", "--grad_accum", "2",
              "--steps_per_call", "2", "--save_latest", "2"])
        run = os.path.join(str(tmp_path), "accum")
        with open(os.path.join(run, "config.json")) as f:
            assert json.load(f)["train"]["grad_accum_steps"] == 2
        ckpt = os.path.join(run, "ckpt")
        assert os.path.isdir(ckpt) and len(os.listdir(ckpt)) > 0
