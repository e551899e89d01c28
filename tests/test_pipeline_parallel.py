"""Pipeline parallelism (GPipe ring over 'pipe') on the virtual CPU mesh.

The ring is a layout, not a semantic: every test checks the pipelined
computation — including its backward (grad-of-ppermute is the reverse
ring) — against the sequential one.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.config import ParallelConfig
from motiondiffusion_moe_tpu.diffusion.gaussian import make_schedule
from motiondiffusion_moe_tpu.models import MotionTransformer
from motiondiffusion_moe_tpu.parallel import (
    gpipe,
    make_mesh,
    make_sharded_train_step,
    param_shardings,
    shard_batch,
)
from motiondiffusion_moe_tpu.parallel.mesh import PIPE_AXIS
from motiondiffusion_moe_tpu.training import create_train_state, make_train_step

from test_parallel import make_batch, tiny_cfg


def _scan_cfg(batch: int, num_layers: int = 2):
    cfg = tiny_cfg(batch)
    return replace(cfg, model=replace(cfg.model, num_layers=num_layers,
                                      scan_blocks=True,
                                      moe_compute="dense_fused"))


class TestGpipeUnit:
    """The executor itself, with a toy per-layer function."""

    @pytest.mark.parametrize("S,M", [(2, 2), (2, 4), (4, 4)])
    def test_matches_sequential(self, S, M):
        L, B, D = 4, 8, 16
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((L, D, D)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

        def stage_fn(w_local, ring, ctx, xs_local, m):
            def one(carry, wl):
                return jnp.tanh(carry @ wl), None
            h, _ = jax.lax.scan(one, ring["h"], w_local)
            return dict(ring, h=h), jnp.zeros((), jnp.float32)

        # sequential reference
        ref = x
        for l in range(L):
            ref = jnp.tanh(ref @ w[l])

        mesh = make_mesh(S, pipeline_parallel=S)  # data=1
        out, aux = gpipe(stage_fn, w, {"h": x}, {}, mesh, M)
        np.testing.assert_allclose(np.asarray(out["h"]), np.asarray(ref),
                                   atol=1e-6)
        assert float(aux) == 0.0

    def test_gradient_matches_sequential(self):
        """Backward pipelining: grads through the ring == sequential grads."""
        L, B, D, S, M = 2, 4, 8, 2, 2
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.standard_normal((L, D, D)).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

        def seq_loss(w):
            h = x
            for l in range(L):
                h = jnp.tanh(h @ w[l])
            return jnp.sum(h ** 2)

        def stage_fn(w_local, ring, ctx, xs_local, m):
            def one(carry, wl):
                return jnp.tanh(carry @ wl), None
            h, _ = jax.lax.scan(one, ring["h"], w_local)
            return dict(ring, h=h), jnp.zeros((), jnp.float32)

        mesh = make_mesh(S, pipeline_parallel=S)

        def pp_loss(w):
            out, _ = gpipe(stage_fn, w, {"h": x}, {}, mesh, M)
            return jnp.sum(out["h"] ** 2)

        g_ref = jax.grad(seq_loss)(w)
        g_pp = jax.jit(jax.grad(pp_loss))(w)
        np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref),
                                   atol=1e-5)

    def test_aux_reduces_over_data_axis(self):
        """DP x PP: the aux returned by gpipe is the mean over the FULL
        microbatch (pmean over 'data'), not data-shard-0's local value —
        regression for the silently-unreduced P() out-spec."""
        L, B, D, S, M = 2, 8, 4, 2, 2
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.standard_normal((L, D, D)).astype(np.float32))
        # strongly asymmetric across the batch so data shards differ
        x = jnp.asarray(
            (rng.standard_normal((B, D)) + np.arange(B)[:, None])
            .astype(np.float32))

        def stage_fn(w_local, ring, ctx, xs_local, m):
            def one(carry, wl):
                return jnp.tanh(carry @ wl), None
            h, _ = jax.lax.scan(one, ring["h"], w_local)
            # data-dependent aux: mean of the stage output
            return dict(ring, h=h), jnp.mean(h)

        # sequential expected value: per microbatch, per stage, the mean
        # over the FULL microbatch; summed over stages, averaged over M
        Lloc = L // S
        expected = 0.0
        for m in range(M):
            h = x.reshape(M, B // M, D)[m]
            for s in range(S):
                for l in range(s * Lloc, (s + 1) * Lloc):
                    h = jnp.tanh(h @ w[l])
                expected += float(jnp.mean(h))
        expected /= M

        mesh = make_mesh(4, pipeline_parallel=S)  # data=2 x pipe=2
        _, aux = gpipe(stage_fn, w, {"h": x}, {}, mesh, M)
        assert float(aux) == pytest.approx(expected, rel=1e-5)

    def test_context_not_circulated(self):
        """Context (conditioning) is read per microbatch, not ringed: the
        stage must see the SAME microbatch's context as its ring data."""
        L, B, D, S, M = 2, 8, 4, 2, 4
        w = jnp.zeros((L, D, D), jnp.float32)
        x = jnp.tile(jnp.arange(M, dtype=jnp.float32).repeat(B // M)
                     [:, None], (1, D))  # microbatch m filled with m

        def stage_fn(w_local, ring, ctx, xs_local, m):
            # h' = h + ctx; ctx equals the microbatch id, so after S
            # stages h = id * (1 + S) iff context tracked the ring
            return dict(ring, h=ring["h"] + ctx["c"]), jnp.zeros(
                (), jnp.float32)

        mesh = make_mesh(S, pipeline_parallel=S)
        out, _ = gpipe(stage_fn, w, {"h": x}, {"c": x}, mesh, M)
        np.testing.assert_allclose(np.asarray(out["h"]),
                                   np.asarray(x * (1 + S)), atol=0)


class TestPPValidation:
    def test_requires_scan_blocks(self):
        cfg = tiny_cfg(4)  # scan_blocks=False
        mesh = make_mesh(2, pipeline_parallel=2)
        model = MotionTransformer(config=cfg.model, mesh=mesh)
        b = make_batch(2)
        with pytest.raises(ValueError, match="scan_blocks"):
            model.init({"params": jax.random.key(0)}, b["motion"], b["t"],
                       b["length"], text_ids=b["text_ids"])

    def test_rejects_ep_composition(self):
        cfg = _scan_cfg(4)
        mesh = make_mesh(4, pipeline_parallel=2, expert_parallel=2)
        model = MotionTransformer(config=cfg.model, mesh=mesh)
        b = make_batch(2)
        with pytest.raises(ValueError, match="composes with 'data' only"):
            model.init({"params": jax.random.key(0)}, b["motion"], b["t"],
                       b["length"], text_ids=b["text_ids"])

    def test_trainer_builds_pp_mesh(self):
        from motiondiffusion_moe_tpu.training.trainer import Trainer
        # 8 devices, pp=2 -> data axis 4; batch 16 / M=2 -> microbatch 8,
        # divisible by the data axis
        cfg = _scan_cfg(16)
        cfg = replace(cfg,
                      model=replace(cfg.model, pipeline_microbatches=2),
                      parallel=ParallelConfig(num_pipeline_stages=2))
        tr = Trainer(cfg)
        assert tr.mesh is not None
        assert tr.mesh.shape[PIPE_AXIS] == 2

    def test_trainer_rejects_indivisible_microbatches(self):
        """PP misconfiguration fails at Trainer construction with a clear
        message, not inside the first jitted step's shard_map."""
        from motiondiffusion_moe_tpu.training.trainer import Trainer
        # batch 4 / default M=4 -> microbatch 1, NOT divisible by data=4
        cfg = _scan_cfg(4)
        cfg = replace(cfg, parallel=ParallelConfig(num_pipeline_stages=2))
        with pytest.raises(ValueError, match="pipeline_microbatches"):
            Trainer(cfg)

    def test_trainer_rejects_indivisible_layers(self):
        """num_layers % pp != 0 fails at construction too (the stacked
        [L, ...] params shard into contiguous stages)."""
        from motiondiffusion_moe_tpu.training.trainer import Trainer
        cfg = _scan_cfg(16, num_layers=6)
        cfg = replace(cfg,
                      model=replace(cfg.model, pipeline_microbatches=2),
                      parallel=ParallelConfig(num_pipeline_stages=4))
        with pytest.raises(ValueError, match="num_layers"):
            Trainer(cfg)

    def test_pipeline_rejects_indivisible_microbatches(self):
        from motiondiffusion_moe_tpu.pipeline import GenerationPipeline
        cfg = _scan_cfg(8)
        cfg = replace(cfg, model=replace(cfg.model,
                                         pipeline_microbatches=16))
        mesh = make_mesh(4, pipeline_parallel=2)
        with pytest.raises(ValueError, match="CFG-doubled"):
            GenerationPipeline(cfg, None, None, micro_batch=4, mesh=mesh)


class TestPPForward:
    @pytest.mark.slow
    def test_forward_matches_single_device(self):
        """PP forward (2 stages x 2 data, M=2) == single-device scanned
        forward on the same weights."""
        cfg = _scan_cfg(4)
        b = make_batch(4)
        x, t, length, ids = b["motion"], b["t"], b["length"], b["text_ids"]

        ref_model = MotionTransformer(config=cfg.model)
        params = ref_model.init({"params": jax.random.key(0)}, x, t, length,
                                text_ids=ids)
        ref = ref_model.apply(params, x, t, length, text_ids=ids,
                              mutable=["moe_losses", "moe_metrics"])[0]

        mesh = make_mesh(4, pipeline_parallel=2)  # data=2 x pipe=2
        pcfg = replace(cfg.model, pipeline_microbatches=2)
        pp_model = MotionTransformer(config=pcfg, mesh=mesh)
        with mesh:
            out = jax.jit(lambda p: pp_model.apply(
                p, x, t, length, text_ids=ids,
                mutable=["moe_losses", "moe_metrics"])[0])(params)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   atol=2e-5, rtol=1e-5)


class TestPPServing:
    @pytest.mark.slow
    def test_pipeline_pp_mesh_matches_single_device(self):
        """GenerationPipeline with a (data, pipe) mesh — pipeline-parallel
        SERVING through the public API — reproduces the single-device
        motions."""
        from motiondiffusion_moe_tpu.pipeline import GenerationPipeline

        cfg = _scan_cfg(8)
        cfg = replace(cfg, model=replace(cfg.model, pipeline_microbatches=2))
        ref_model = MotionTransformer(config=cfg.model)
        b = make_batch(2)
        params = ref_model.init({"params": jax.random.key(0)}, b["motion"],
                                b["t"], b["length"],
                                text_ids=b["text_ids"])

        caps = ["a person walks"] * 8
        lens = [16] * 8
        pipe_ref = GenerationPipeline(cfg, ref_model, params, sampler="ddim",
                                      num_inference_steps=10, micro_batch=8)
        ref = pipe_ref.generate(caps, lens, rng=jax.random.key(5))

        # model=None: the pipeline builds MotionTransformer(mesh=mesh)
        # itself, so the GPipe ring actually engages
        mesh = make_mesh(4, pipeline_parallel=2)  # data=2 x pipe=2
        pipe_pp = GenerationPipeline(cfg, None, params, sampler="ddim",
                                     num_inference_steps=10, micro_batch=8,
                                     mesh=mesh)
        out = pipe_pp.generate(caps, lens, rng=jax.random.key(5))

        assert len(out) == len(ref)
        for a, b2 in zip(out, ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=2e-4)


class TestPPTraining:
    @pytest.mark.slow
    def test_pp_with_remat_trains(self):
        """remat_blocks applies inside the ring (jax.checkpoint around each
        block apply): the pipelined step still runs and the loss moves."""
        cfg = _scan_cfg(4)
        cfg = replace(cfg, model=replace(cfg.model, pipeline_microbatches=2,
                                         remat_blocks="dots"))
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        mesh = make_mesh(4, pipeline_parallel=2)
        model = MotionTransformer(config=cfg.model, mesh=mesh)
        state = create_train_state(model, cfg, jax.random.key(0))
        raw = make_train_step(model, sched, cfg, jit=False)
        with mesh:
            step, sstate = make_sharded_train_step(raw, state, mesh)
            batch = shard_batch(make_batch(4), mesh)
            s1, m1 = step(sstate, batch, jax.random.key(1))
            s2, m2 = step(s1, batch, jax.random.key(2))
        l1, l2 = float(m1["loss_total"]), float(m2["loss_total"])
        assert np.isfinite(l1) and np.isfinite(l2) and l1 != l2

    @pytest.mark.slow
    def test_train_step_matches_single_device(self):
        """DP x PP train step: same loss, same updated params as the
        unsharded scanned step (dropout 0, survival 1 -> exact parity)."""
        cfg = _scan_cfg(4)
        cfg = replace(cfg, model=replace(cfg.model, pipeline_microbatches=2))
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        batch_np = make_batch(4)

        ref_model = MotionTransformer(config=cfg.model)
        state = create_train_state(ref_model, cfg, jax.random.key(0))
        raw_ref = make_train_step(ref_model, sched, cfg, jit=False)
        state1, metrics1 = jax.jit(raw_ref)(state, batch_np,
                                            jax.random.key(1))
        loss1 = float(metrics1["loss_total"])

        mesh = make_mesh(4, pipeline_parallel=2)
        pp_model = MotionTransformer(config=cfg.model, mesh=mesh)
        state2 = create_train_state(pp_model, cfg, jax.random.key(0))
        raw = make_train_step(pp_model, sched, cfg, jit=False)
        with mesh:
            step, sstate = make_sharded_train_step(raw, state2, mesh)
            # the stacked block leaves must actually shard over 'pipe'
            sh = param_shardings(state2.params, mesh)
            flat = jax.tree_util.tree_leaves_with_path(sh)
            pipe_sharded = [
                s.spec for p, s in flat
                if "blocks_" in jax.tree_util.keystr(p)]
            assert pipe_sharded
            assert all(s[0] == PIPE_AXIS for s in pipe_sharded)

            batch = shard_batch(batch_np, mesh)
            new_state, metrics2 = step(sstate, batch, jax.random.key(1))
        loss2 = float(metrics2["loss_total"])
        assert loss1 == pytest.approx(loss2, rel=1e-5)

        a = jax.tree_util.tree_leaves(jax.device_get(state1.params))
        b = jax.tree_util.tree_leaves(jax.device_get(new_state.params))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-5)
