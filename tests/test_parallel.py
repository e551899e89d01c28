"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

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
from motiondiffusion_moe_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    param_shardings,
    shard_batch,
)
from motiondiffusion_moe_tpu.parallel.mesh import DATA_AXIS, EXPERT_AXIS
from motiondiffusion_moe_tpu.training import create_train_state, make_train_step


def tiny_cfg(dp_batch: int) -> ExperimentConfig:
    return ExperimentConfig(
        name="par",
        data=DataConfig(dim_pose=26, max_motion_length=16, num_joints=4),
        diffusion=DiffusionConfig(num_timesteps=100),
        model=ModelConfig(input_feats=26, max_frames=16, latent_dim=32,
                          ff_size=16, num_layers=1, num_heads=2,
                          num_experts=4, text_latent_dim=16,
                          num_random_features=8, text_max_tokens=8,
                          dropout=0.0, stochastic_depth_min=1.0,
                          moe_compute="dense",  # EP-shardable einsum form
                          dtype="float32"),
        train=TrainConfig(batch_size=dp_batch, lr=1e-3, uncond_step=False),
    )


def make_batch(B: int):
    rng = np.random.default_rng(0)
    return {
        "motion": rng.standard_normal((B, 16, 26)).astype(np.float32),
        "length": np.full((B,), 16, np.int32),
        "text_ids": np.ones((B, 8), np.int32),
        "t": (np.arange(B) * 13 % 100).astype(np.int32),
        "t_weight": np.ones((B,), np.float32),
    }


class TestMesh:
    def test_devices(self):
        assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"

    def test_make_mesh_shapes(self):
        mesh = make_mesh(8, expert_parallel=2)
        assert mesh.shape[DATA_AXIS] == 4
        assert mesh.shape[EXPERT_AXIS] == 2

    @pytest.mark.slow
    def test_param_shardings_expert_rule(self):
        cfg = tiny_cfg(8)
        model = MotionTransformer(config=cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0))
        mesh = make_mesh(8, expert_parallel=2)
        sh = param_shardings(state.params, mesh)
        flat = jax.tree_util.tree_leaves_with_path(sh)
        expert_sharded = [
            (jax.tree_util.keystr(p), s) for p, s in flat
            if s.spec and s.spec[0] == EXPERT_AXIS]
        # every SwitchMoE has w1,w2,b1,b2 -> 2 scales x 1 layer x 2 branches
        # x 4 tensors = 16
        assert len(expert_sharded) == 16
        for pstr, _ in expert_sharded:
            assert "_moe" in pstr


class TestShardedTrainStep:
    @pytest.mark.parametrize("ep", [1, 2])
    @pytest.mark.slow
    def test_sharded_step_runs(self, ep):
        n = 8
        dp = n // ep
        cfg = tiny_cfg(2 * dp)
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        state = create_train_state(model, cfg, jax.random.key(0))
        raw = make_train_step(model, sched, cfg, jit=False)
        mesh = make_mesh(n, expert_parallel=ep)
        with mesh:
            step, sstate = make_sharded_train_step(raw, state, mesh)
            batch = shard_batch(make_batch(2 * dp), mesh)
            new_state, metrics = step(sstate, batch, jax.random.key(1))
            assert np.isfinite(float(metrics["loss_total"]))
            assert int(new_state.step) == 1

    @pytest.mark.slow
    def test_sharded_matches_single_device(self):
        """DPxEP-sharded step computes the same loss and the same updated
        params as the unsharded step (SPMD is a layout, not a semantic)."""
        cfg = tiny_cfg(8)
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        state = create_train_state(model, cfg, jax.random.key(0))
        raw = make_train_step(model, sched, cfg, jit=False)
        batch_np = make_batch(8)

        # single device reference
        state1, metrics1 = jax.jit(raw)(state, batch_np, jax.random.key(1))
        loss1 = float(metrics1["loss_total"])

        # sharded
        state2 = create_train_state(model, cfg, jax.random.key(0))
        mesh = make_mesh(8, expert_parallel=2)
        with mesh:
            step, sstate = make_sharded_train_step(raw, state2, mesh)
            batch = shard_batch(batch_np, mesh)
            new_state, metrics2 = step(sstate, batch, jax.random.key(1))
        loss2 = float(metrics2["loss_total"])
        assert loss1 == pytest.approx(loss2, rel=1e-5)

        a = jax.tree_util.tree_leaves(jax.device_get(state1.params))
        b = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-5)


class TestDryrun:
    @pytest.mark.slow
    def test_dryrun_multichip(self):
        import sys, os
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)


class TestTensorParallel:
    """TP ('model' axis): Megatron column/row split of the FFN stacks."""

    def test_make_mesh_3d(self):
        from motiondiffusion_moe_tpu.parallel.mesh import MODEL_AXIS
        mesh = make_mesh(8, expert_parallel=2, tensor_parallel=2)
        assert mesh.shape[DATA_AXIS] == 2
        assert mesh.shape[EXPERT_AXIS] == 2
        assert mesh.shape[MODEL_AXIS] == 2

    @pytest.mark.slow
    def test_param_shardings_tp_rules(self):
        from motiondiffusion_moe_tpu.parallel.mesh import MODEL_AXIS
        cfg = tiny_cfg(8)
        model = MotionTransformer(config=cfg.model)
        state = create_train_state(model, cfg, jax.random.key(0))
        mesh = make_mesh(8, expert_parallel=2, tensor_parallel=2)
        sh = param_shardings(state.params, mesh)
        flat = jax.tree_util.tree_leaves_with_path(sh)
        col = row = expert_hidden = 0
        for p, s in flat:
            pstr = jax.tree_util.keystr(p)
            if not s.spec:
                continue
            if "ffn_0" in pstr and pstr.endswith("['kernel']"):
                assert s.spec == (None, MODEL_AXIS), pstr
                col += 1
            if "ffn_1" in pstr and pstr.endswith("['kernel']"):
                assert s.spec == (MODEL_AXIS, None), pstr
                row += 1
            if "_moe" in pstr and pstr.endswith("['w1']"):
                assert s.spec == (EXPERT_AXIS, None, MODEL_AXIS), pstr
                expert_hidden += 1
        # 2 scales x 1 layer: one exact-xattn MLP each; 2 MoE branches each
        assert col == 2 and row == 2
        assert expert_hidden == 4

    @pytest.mark.parametrize("ep,tp", [(1, 2), (2, 2)])
    @pytest.mark.slow
    def test_tp_sharded_matches_single_device(self, ep, tp):
        """DPxEPxTP-sharded step computes the same loss/params as the
        unsharded step — the partitioner's psums are exact."""
        cfg = tiny_cfg(8 // (ep * tp) * 2)
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        state = create_train_state(model, cfg, jax.random.key(0))
        raw = make_train_step(model, sched, cfg, jit=False)
        B = cfg.train.batch_size
        batch_np = make_batch(B)

        state1, metrics1 = jax.jit(raw)(state, batch_np, jax.random.key(1))
        loss1 = float(metrics1["loss_total"])

        state2 = create_train_state(model, cfg, jax.random.key(0))
        mesh = make_mesh(8, expert_parallel=ep, tensor_parallel=tp)
        with mesh:
            step, sstate = make_sharded_train_step(raw, state2, mesh)
            batch = shard_batch(batch_np, mesh)
            new_state, metrics2 = step(sstate, batch, jax.random.key(1))
        loss2 = float(metrics2["loss_total"])
        assert loss1 == pytest.approx(loss2, rel=1e-5)

        a = jax.tree_util.tree_leaves(jax.device_get(state1.params))
        b = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-5)

    def test_trainer_builds_tp_mesh(self):
        from dataclasses import replace
        from motiondiffusion_moe_tpu.config import ParallelConfig
        from motiondiffusion_moe_tpu.parallel.mesh import MODEL_AXIS
        from motiondiffusion_moe_tpu.training.trainer import Trainer
        cfg = tiny_cfg(4)
        cfg = replace(cfg,
                      model=replace(cfg.model, moe_compute="dense_fused"),
                      parallel=ParallelConfig(num_expert_partitions=2,
                                              num_model_partitions=2))
        tr = Trainer(cfg)
        assert tr.mesh is not None
        assert tr.mesh.shape[MODEL_AXIS] == 2
        # EP active -> trainer must have switched off dense_fused
        assert tr.cfg.model.moe_compute == "dense"


class TestZero1:
    """ZeRO-1: Adam moments + EMA sharded over 'data'
    (``parallel.mesh._zero1_spec``)."""

    def test_zero1_spec_unit(self):
        from jax.sharding import PartitionSpec as P
        from motiondiffusion_moe_tpu.parallel.mesh import _zero1_spec
        # first unsharded divisible dim gets 'data'
        assert _zero1_spec(P(), (8, 3), 4) == P("data", None)
        # dim0 taken by 'expert' -> falls to dim1
        assert _zero1_spec(P("expert", None, "model"), (4, 8, 6), 4) \
            == P("expert", "data", "model")
        # indivisible everywhere -> unchanged
        assert _zero1_spec(P(), (3, 5), 4) == P()
        # scalar / dp=1 -> unchanged
        assert _zero1_spec(P(), (), 4) == P()
        assert _zero1_spec(P(), (8,), 1) == P()
        # spec shorter than rank (trailing dims implicitly None)
        assert _zero1_spec(P("expert"), (4, 8), 4) == P("expert", "data")

    @pytest.mark.slow
    def test_zero1_matches_single_device_and_shards_moments(self):
        """zero1=True computes the same updated params/EMA as the unsharded
        step (reduce-scatter + sharded update + all-gather is a layout, not
        a semantic) AND actually data-shards the moment/EMA storage."""
        import dataclasses as _dc
        cfg = tiny_cfg(8)
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train, ema_decay=0.99))
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        raw = make_train_step(model, sched, cfg, jit=False)
        batch_np = make_batch(8)

        state1 = create_train_state(model, cfg, jax.random.key(0))
        state1, metrics1 = jax.jit(raw)(state1, batch_np, jax.random.key(1))
        loss1 = float(metrics1["loss_total"])

        state2 = create_train_state(model, cfg, jax.random.key(0))
        mesh = make_mesh(8, expert_parallel=2)  # dp=4
        with mesh:
            step, sstate = make_sharded_train_step(raw, state2, mesh,
                                                   zero1=True)
            # the placed state's moments and EMA are data-sharded...
            data_sharded = sum(
                1 for leaf in jax.tree_util.tree_leaves(sstate.opt_state)
                if hasattr(leaf, "sharding")
                and DATA_AXIS in jax.tree_util.tree_leaves(
                    tuple(leaf.sharding.spec)))
            assert data_sharded > 10, "no moment leaf got a 'data' spec"
            big = [leaf for leaf in
                   jax.tree_util.tree_leaves(sstate.ema_params)
                   if hasattr(leaf, "size") and leaf.size >= 64]
            assert big, "EMA tree unexpectedly empty"
            for leaf in big[:5]:
                shard = leaf.addressable_shards[0].data
                assert shard.size < leaf.size, (
                    f"EMA leaf {leaf.shape} not sharded")
            # ...params stay whole per device (only dp replicates them)
            for leaf in jax.tree_util.tree_leaves(sstate.params)[:5]:
                spec = tuple(leaf.sharding.spec)
                assert DATA_AXIS not in jax.tree_util.tree_leaves(spec)

            batch = shard_batch(batch_np, mesh)
            new_state, metrics2 = step(sstate, batch, jax.random.key(1))
        assert loss1 == pytest.approx(float(metrics2["loss_total"]), rel=1e-5)
        for name, t1, t2 in (("params", state1.params, new_state.params),
                             ("ema", state1.ema_params,
                              new_state.ema_params)):
            for x, y in zip(
                    jax.tree_util.tree_leaves(jax.device_get(t1)),
                    jax.tree_util.tree_leaves(jax.device_get(t2))):
                np.testing.assert_allclose(x, y, atol=1e-5, err_msg=name)


class TestShardedGradAccum:
    @pytest.mark.slow
    def test_sharded_accum_matches_single_device(self):
        """grad_accum_steps=2 under a DP mesh (batch_leading_dims=1, each
        microbatch data-sharded on its own batch axis) computes the same
        update as the unsharded accumulation step."""
        import dataclasses as _dc
        cfg = tiny_cfg(8)
        cfg = _dc.replace(cfg, train=_dc.replace(cfg.train,
                                                 grad_accum_steps=2))
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        raw = make_train_step(model, sched, cfg, jit=False)
        batch_np = make_batch(8)
        chunked = {k: v.reshape(2, 4, *v.shape[1:])
                   for k, v in batch_np.items()}

        state1 = create_train_state(model, cfg, jax.random.key(0))
        state1, metrics1 = jax.jit(raw)(state1, chunked, jax.random.key(1))
        loss1 = float(metrics1["loss_total"])
        assert int(state1.step) == 1

        state2 = create_train_state(model, cfg, jax.random.key(0))
        mesh = make_mesh(8, expert_parallel=2)
        with mesh:
            step, sstate = make_sharded_train_step(raw, state2, mesh,
                                                   batch_leading_dims=1)
            batch = shard_batch(chunked, mesh, leading_dims=1)
            new_state, metrics2 = step(sstate, batch, jax.random.key(1))
        assert loss1 == pytest.approx(float(metrics2["loss_total"]), rel=1e-5)
        np.testing.assert_allclose(np.asarray(metrics1["per_sample_mse"]),
                                   np.asarray(metrics2["per_sample_mse"]),
                                   atol=1e-5)
        for x, y in zip(
                jax.tree_util.tree_leaves(jax.device_get(state1.params)),
                jax.tree_util.tree_leaves(jax.device_get(new_state.params))):
            np.testing.assert_allclose(x, y, atol=1e-5)
