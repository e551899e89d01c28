"""tools/convert_checkpoint: exact layout conversion of a real run dir."""

import os

import jax
import numpy as np
import pytest


def _train_tiny(tmp_path, name, *extra):
    from motiondiffusion_moe_tpu.tools.train import main
    main(["--name", name, "--dataset", "synthetic", "--synthetic_size", "8",
          "--checkpoint_dir", str(tmp_path), "--batch_size", "4",
          "--num_epochs", "2", "--num_layers", "2", "--latent_dim", "32",
          "--ff_size", "16", "--num_heads", "2", "--num_experts", "4",
          "--text_latent_dim", "16", "--diffusion_steps", "50",
          "--no_uncond_step", "--save_latest", "2", *extra])
    return os.path.join(str(tmp_path), name)


@pytest.mark.slow
def test_convert_roundtrip_and_resume(tmp_path):
    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.models import (
        MotionTransformer, stack_block_params)
    from motiondiffusion_moe_tpu.tools.convert_checkpoint import main as conv
    from motiondiffusion_moe_tpu.training import (
        CheckpointManager, Trainer, create_train_state)

    # train WITH ema so the EMA tree rides through both conversions
    run = _train_tiny(tmp_path, "src", "--ema_decay", "0.999")

    # named -> stacked
    conv(["--run_dir", run, "--to", "stacked"])
    out = run + "_stacked"
    new_cfg = ExperimentConfig.load(os.path.join(out, "config.json"))
    assert new_cfg.model.scan_blocks is True
    # the run's meta/ (normalizer stats) rides along — evaluate/visualize
    # silently fall back to an identity normalizer without it
    assert os.path.isdir(os.path.join(out, "meta"))
    assert os.listdir(os.path.join(out, "meta"))

    # the converted params == stack_block_params(source params), exactly
    src_cfg = ExperimentConfig.load(os.path.join(run, "config.json"))
    src_tmpl = create_train_state(
        MotionTransformer(config=src_cfg.model), src_cfg, jax.random.key(0))
    src_state, _ = CheckpointManager(
        os.path.join(run, "ckpt")).restore(src_tmpl)
    dst_tmpl = create_train_state(
        MotionTransformer(config=new_cfg.model), new_cfg, jax.random.key(0))
    dst_state, _ = CheckpointManager(
        os.path.join(out, "ckpt")).restore(dst_tmpl)
    want = stack_block_params(src_state.params)["params"]["blocks_low"]
    got = dst_state.params["params"]["blocks_low"]
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(dst_state.step) == int(src_state.step)

    # the converted run dir RESUMES: one more training epoch in the
    # stacked layout picks up the converted state
    tr = Trainer(new_cfg)
    state = tr.init_state()
    mngr = CheckpointManager(os.path.join(out, "ckpt"))
    restored = mngr.restore(state)
    assert restored is not None
    state2, epoch = restored
    assert int(state2.step) > 0

    # stacked -> named round-trip is exact
    conv(["--run_dir", out, "--to", "named", "--out",
          str(tmp_path / "back")])
    back_tmpl = create_train_state(
        MotionTransformer(config=src_cfg.model), src_cfg, jax.random.key(0))
    back_state, _ = CheckpointManager(
        os.path.join(str(tmp_path / "back"), "ckpt")).restore(back_tmpl)
    for a, b in zip(jax.tree_util.tree_leaves(src_state.params),
                    jax.tree_util.tree_leaves(back_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Adam moments converted too (resume is bit-identical, not just params)
    for a, b in zip(jax.tree_util.tree_leaves(src_state.opt_state),
                    jax.tree_util.tree_leaves(back_state.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ... and the EMA weights
    assert src_state.ema_params is not None
    assert back_state.ema_params is not None
    for a, b in zip(jax.tree_util.tree_leaves(src_state.ema_params),
                    jax.tree_util.tree_leaves(back_state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_rejects_same_layout(tmp_path):
    from motiondiffusion_moe_tpu.tools.convert_checkpoint import main as conv
    run = _train_tiny(tmp_path, "same")
    with pytest.raises(SystemExit, match="already"):
        conv(["--run_dir", run, "--to", "named"])
