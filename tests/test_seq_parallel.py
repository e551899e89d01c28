"""Sequence parallelism (SP) on the 8-device virtual CPU mesh.

SP shards ACTIVATIONS on the frame axis T (no parameter is sharded over
'seq'): ``MotionTransformer._seq_constrain`` pins [B, T, D] activations to
``P('data', 'seq', None)`` and XLA closes the Performer kv-moment
reduction (the only cross-position contraction in the block) with an
all-reduce over 'seq'. The reference has no sequence parallelism at all
(SURVEY.md §2.4: seq len fixed at <=196); this is a TPU-native extension
for long-context conditioning.

SPMD is a layout, not a semantic — every test here checks the sharded
computation against the single-device one.
"""

from dataclasses import replace

import jax
import numpy as np
import pytest

from motiondiffusion_moe_tpu.config import (
    DataConfig,
    DiffusionConfig,
    ExperimentConfig,
    ModelConfig,
    ParallelConfig,
    TrainConfig,
)
from motiondiffusion_moe_tpu.diffusion.gaussian import make_schedule
from motiondiffusion_moe_tpu.models import MotionTransformer
from motiondiffusion_moe_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    shard_batch,
)
from motiondiffusion_moe_tpu.parallel.mesh import (
    DATA_AXIS,
    EXPERT_AXIS,
    MODEL_AXIS,
    SEQ_AXIS,
)
from motiondiffusion_moe_tpu.training import create_train_state, make_train_step

from test_parallel import make_batch, tiny_cfg


class TestSeqMesh:
    def test_mesh_has_seq_axis_only_when_requested(self):
        mesh = make_mesh(8, expert_parallel=2)
        assert SEQ_AXIS not in mesh.shape  # 3-axis meshes unchanged
        mesh = make_mesh(8, seq_parallel=2, expert_parallel=2)
        assert mesh.shape[DATA_AXIS] == 2
        assert mesh.shape[SEQ_AXIS] == 2
        assert mesh.shape[EXPERT_AXIS] == 2
        assert mesh.shape[MODEL_AXIS] == 1

    def test_trainer_builds_seq_mesh(self):
        from motiondiffusion_moe_tpu.training.trainer import Trainer
        cfg = tiny_cfg(4)
        cfg = replace(cfg, parallel=ParallelConfig(num_seq_partitions=2))
        tr = Trainer(cfg)
        assert tr.mesh is not None
        assert tr.mesh.shape[SEQ_AXIS] == 2
        # the model must carry the mesh so its seq constraints activate
        assert tr.model.mesh is tr.mesh

    @pytest.mark.slow
    def test_model_disables_kernels_under_seq(self):
        cfg = tiny_cfg(4)
        # data=2 so the B=2 init batch divides the data axis
        mesh = make_mesh(8, seq_parallel=2, expert_parallel=2)
        model = MotionTransformer(config=cfg.model, mesh=mesh)
        B = 2
        batch = make_batch(B)
        variables = model.init({"params": jax.random.key(0)},
                               batch["motion"], batch["t"], batch["length"],
                               text_ids=batch["text_ids"])
        bound = model.bind(variables)
        assert bound._seq_sharded


class TestSeqShardedForward:
    @pytest.mark.slow
    def test_forward_matches_single_device(self):
        """Seq-sharded forward == unsharded forward: the Performer kv
        moments, downsample/upsample convs, and LN chains all partition
        exactly over the sharded T axis."""
        cfg = tiny_cfg(4)
        batch = make_batch(4)
        x, t, length, ids = (batch["motion"], batch["t"], batch["length"],
                             batch["text_ids"])

        ref_model = MotionTransformer(config=cfg.model)
        params = jax.jit(
            lambda k: ref_model.init({"params": k}, x, t, length,
                                     text_ids=ids))(jax.random.key(0))
        ref = jax.jit(lambda p: ref_model.apply(
            p, x, t, length, text_ids=ids,
            mutable=["moe_losses", "moe_metrics"])[0])(params)

        mesh = make_mesh(8, seq_parallel=2, expert_parallel=2)
        sp_model = MotionTransformer(config=cfg.model, mesh=mesh)
        with mesh:
            out = jax.jit(lambda p: sp_model.apply(
                p, x, t, length, text_ids=ids,
                mutable=["moe_losses", "moe_metrics"])[0])(params)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   atol=2e-5, rtol=1e-5)


class TestSeqActuallyPartitions:
    @pytest.mark.slow
    def test_compiled_program_contains_collectives(self):
        """Guard against silent replication: the OPTIMIZED HLO of the
        seq-sharded forward must contain cross-device collectives (the
        Performer kv-moment all-reduce over 'seq' / EP resharding) — a
        partitioner that replicated everything would emit none."""
        import re

        cfg = tiny_cfg(4)
        batch = make_batch(4)
        x, t, length, ids = (batch["motion"], batch["t"], batch["length"],
                             batch["text_ids"])
        mesh = make_mesh(8, seq_parallel=2, expert_parallel=2)
        model = MotionTransformer(config=cfg.model, mesh=mesh)
        params = model.init({"params": jax.random.key(0)}, x, t, length,
                            text_ids=ids)
        with mesh:
            txt = jax.jit(lambda p: model.apply(
                p, x, t, length, text_ids=ids,
                mutable=["moe_losses", "moe_metrics"])[0]
            ).lower(params).compile().as_text()
        n_ar = len(re.findall(r"\ball-reduce", txt))
        n_ag = len(re.findall(r"\ball-gather", txt))
        assert n_ar > 0, "no all-reduce in the seq-sharded program"
        assert n_ar + n_ag >= 2, (n_ar, n_ag)


class TestSeqShardedTraining:
    @pytest.mark.slow
    def test_train_step_matches_single_device(self):
        """DP x SP x EP train step: same loss, same updated params as the
        unsharded step."""
        cfg = tiny_cfg(4)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        batch_np = make_batch(4)

        ref_model = MotionTransformer(config=cfg.model)
        state = create_train_state(ref_model, cfg, jax.random.key(0))
        raw_ref = make_train_step(ref_model, sched, cfg, jit=False)
        state1, metrics1 = jax.jit(raw_ref)(state, batch_np,
                                            jax.random.key(1))
        loss1 = float(metrics1["loss_total"])

        mesh = make_mesh(8, seq_parallel=2, expert_parallel=2)
        sp_model = MotionTransformer(config=cfg.model, mesh=mesh)
        state2 = create_train_state(sp_model, cfg, jax.random.key(0))
        raw = make_train_step(sp_model, sched, cfg, jit=False)
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

    @pytest.mark.slow
    def test_pipeline_seq_mesh_matches_single_device(self):
        """GenerationPipeline with a (data, seq, expert) mesh — sequence-
        parallel SERVING through the public API — reproduces the
        single-device motions."""
        from motiondiffusion_moe_tpu.pipeline import GenerationPipeline

        cfg = tiny_cfg(8)
        ref_model = MotionTransformer(config=cfg.model)
        B = 2
        batch = make_batch(B)
        params = ref_model.init({"params": jax.random.key(0)},
                                batch["motion"], batch["t"],
                                batch["length"], text_ids=batch["text_ids"])

        caps = ["a person walks"] * 8
        lens = [16] * 8
        pipe_ref = GenerationPipeline(cfg, ref_model, params, sampler="ddim",
                                      num_inference_steps=10, micro_batch=8)
        ref = pipe_ref.generate(caps, lens, rng=jax.random.key(5))

        # model=None: the pipeline builds MotionTransformer(mesh=mesh)
        # itself, so the seq constraints and the partitionable attention
        # path actually engage
        mesh = make_mesh(8, seq_parallel=2, expert_parallel=2)
        pipe_sp = GenerationPipeline(cfg, None, params, sampler="ddim",
                                     num_inference_steps=10, micro_batch=8,
                                     mesh=mesh)
        out = pipe_sp.generate(caps, lens, rng=jax.random.key(5))

        assert len(out) == len(ref)
        for a, b in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    @pytest.mark.slow
    def test_seq_only_mesh_two_steps(self):
        """Pure SP (seq=2, everything else 1): loss finite and moving."""
        cfg = tiny_cfg(2)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        mesh = make_mesh(2, seq_parallel=2)
        model = MotionTransformer(config=cfg.model, mesh=mesh)
        state = create_train_state(model, cfg, jax.random.key(0))
        raw = make_train_step(model, sched, cfg, jit=False)
        with mesh:
            step, sstate = make_sharded_train_step(raw, state, mesh)
            batch = shard_batch(make_batch(2), mesh)
            s1, m1 = step(sstate, batch, jax.random.key(1))
            s2, m2 = step(s1, batch, jax.random.key(2))
        l1, l2 = float(m1["loss_total"]), float(m2["loss_total"])
        assert np.isfinite(l1) and np.isfinite(l2)
        assert l1 != l2
