"""scan_blocks=True: each U-Net scale's decoder blocks as ONE nn.scan over
stacked [L, ...] params.

Same math as the named per-block layout — the point is an ~Lx smaller
traced program (XLA compile time and binary size; through the remote-chip
tunnel compiles cost minutes) and a stacked layer axis that layer-sharded
schemes can partition. Checkpoints convert between layouts with
``stack_block_params`` / ``unstack_block_params``.
"""

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from motiondiffusion_moe_tpu.diffusion.gaussian import make_schedule
from motiondiffusion_moe_tpu.models import (
    MotionTransformer,
    stack_block_params,
    unstack_block_params,
)
from motiondiffusion_moe_tpu.parallel import (
    make_mesh,
    make_sharded_train_step,
    param_shardings,
    shard_batch,
)
from motiondiffusion_moe_tpu.parallel.mesh import EXPERT_AXIS
from motiondiffusion_moe_tpu.training import create_train_state, make_train_step

from test_parallel import make_batch, tiny_cfg


def _two_layer_cfg(batch: int):
    cfg = tiny_cfg(batch)
    return replace(cfg, model=replace(cfg.model, num_layers=2))


class TestLayoutConverters:
    @pytest.mark.slow
    def test_stack_unstack_roundtrip(self):
        cfg = _two_layer_cfg(2)
        model = MotionTransformer(config=cfg.model)
        b = make_batch(2)
        params = model.init({"params": jax.random.key(0)}, b["motion"],
                            b["t"], b["length"], text_ids=b["text_ids"])
        stacked = stack_block_params(params)
        assert "blocks_low" in stacked["params"]
        assert "block_low_0" not in stacked["params"]
        # every stacked leaf gained a leading L=2 axis
        for leaf in jax.tree_util.tree_leaves(
                stacked["params"]["blocks_low"]):
            assert leaf.shape[0] == 2
        back = unstack_block_params(stacked)
        ref_leaves = jax.tree_util.tree_leaves_with_path(params)
        back_leaves = dict(jax.tree_util.tree_leaves_with_path(back))
        # round-trip is exact, same tree
        assert len(ref_leaves) == len(back_leaves)
        for path, leaf in ref_leaves:
            np.testing.assert_array_equal(leaf, back_leaves[path])


class TestScannedForward:
    @pytest.mark.slow
    def test_matches_named_layout(self):
        """Scanned forward == named forward on the SAME weights (converted
        with stack_block_params)."""
        cfg = _two_layer_cfg(4)
        b = make_batch(4)
        x, t, length, ids = b["motion"], b["t"], b["length"], b["text_ids"]

        named = MotionTransformer(config=cfg.model)
        params = named.init({"params": jax.random.key(0)}, x, t, length,
                            text_ids=ids)
        ref = named.apply(params, x, t, length, text_ids=ids,
                          mutable=["moe_losses", "moe_metrics"])[0]

        scfg = replace(cfg.model, scan_blocks=True)
        scanned = MotionTransformer(config=scfg)
        out, cols = scanned.apply(stack_block_params(params), x, t, length,
                                  text_ids=ids,
                                  mutable=["moe_losses", "moe_metrics"])
        np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                                   atol=2e-5, rtol=1e-5)
        # sown aux losses survive the scan (stacked on a leading layer axis)
        from motiondiffusion_moe_tpu.models.transformer import (
            sum_moe_aux_losses)
        aux = sum_moe_aux_losses(cols)
        assert np.isfinite(float(aux))

    @pytest.mark.slow
    def test_scanned_init_shapes_match_stacked(self):
        """Initializing the scanned model directly produces the same tree
        (paths AND shapes) as stacking a named init."""
        cfg = _two_layer_cfg(2)
        b = make_batch(2)
        x, t, length, ids = b["motion"], b["t"], b["length"], b["text_ids"]

        named = MotionTransformer(config=cfg.model)
        stacked_ref = stack_block_params(
            named.init({"params": jax.random.key(0)}, x, t, length,
                       text_ids=ids))
        scanned = MotionTransformer(
            config=replace(cfg.model, scan_blocks=True))
        direct = scanned.init({"params": jax.random.key(0)}, x, t, length,
                              text_ids=ids)
        # only the params collection round-trips through checkpoints; the
        # sown metrics collections legitimately differ in layout
        ref_shapes = jax.tree.map(lambda l: l.shape, stacked_ref["params"])
        direct_shapes = jax.tree.map(lambda l: l.shape, direct["params"])
        assert ref_shapes == direct_shapes


class TestScannedTraining:
    @pytest.mark.slow
    def test_two_steps_and_remat(self):
        """Scanned model trains (loss finite and moving, params update),
        composed with the remat policy (scan-of-remat)."""
        cfg = _two_layer_cfg(4)
        cfg = replace(cfg, model=replace(cfg.model, scan_blocks=True,
                                         remat_blocks="dots_named",
                                         dropout=0.1,
                                         stochastic_depth_min=0.8))
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        state = create_train_state(model, cfg, jax.random.key(0))
        step = make_train_step(model, sched, cfg, jit=True)
        batch = make_batch(4)
        # the jitted step donates the state buffers: copy before stepping
        p0 = jax.tree.map(np.asarray, state.params)
        s1, m1 = step(state, batch, jax.random.key(1))
        s2, m2 = step(s1, batch, jax.random.key(2))
        l1, l2 = float(m1["loss_total"]), float(m2["loss_total"])
        assert np.isfinite(l1) and np.isfinite(l2)
        assert l1 != l2
        # the STACKED block weights must have moved (grads flow through
        # the scan)
        moved = jax.tree.map(
            lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
            p0["params"]["blocks_low"], s2.params["params"]["blocks_low"])
        assert max(jax.tree_util.tree_leaves(moved)) > 0.0

    @pytest.mark.slow
    def test_ep_sharded_matches_single_device(self):
        """EP-sharded scanned train step == unsharded scanned step: the
        param_shardings rules skip the stacked leading layer axis and still
        shard the expert dim."""
        cfg = _two_layer_cfg(8)
        cfg = replace(cfg, model=replace(cfg.model, scan_blocks=True))
        model = MotionTransformer(config=cfg.model)
        sched = make_schedule(schedule_name="linear", num_timesteps=100)
        state = create_train_state(model, cfg, jax.random.key(0))
        raw = make_train_step(model, sched, cfg, jit=False)
        batch_np = make_batch(8)

        state1, metrics1 = jax.jit(raw)(state, batch_np, jax.random.key(1))
        loss1 = float(metrics1["loss_total"])

        mesh = make_mesh(8, expert_parallel=2)
        # the expert rule must engage on the stacked layout: w1 is
        # [L, E, D, H] -> P(None, 'expert', None, None)
        sh = param_shardings(state.params, mesh)
        flat = jax.tree_util.tree_leaves_with_path(sh)
        stacked_expert = [
            s.spec for p, s in flat
            if "blocks_" in jax.tree_util.keystr(p)
            and jax.tree_util.keystr(p).endswith("['w1']")]
        assert stacked_expert, "no stacked expert weights found"
        for spec in stacked_expert:
            assert spec[0] is None and spec[1] == EXPERT_AXIS, spec

        state2 = create_train_state(model, cfg, jax.random.key(0))
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
