"""Visualization CLI: text -> GIF of generated motion.

Capability match of ``text2motion/tools/visualization.py``:

    python -m motiondiffusion_moe_tpu.tools.visualize \
        --run_dir ./checkpoints/t2m_moe_small \
        --text "a person is running" --motion_length 120 \
        --result_path test_sample.gif [--npy_path out.npy]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True,
                   help="training run dir containing config.json")
    p.add_argument("--text", required=True)
    p.add_argument("--motion_length", type=int, default=120,
                   help="frames at 20 fps, <= 196 (visualization.py:47-57)")
    p.add_argument("--result_path", default="test_sample.gif")
    p.add_argument("--npy_path", default="")
    p.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim", "dpm"])
    p.add_argument("--steps", type=int, default=0,
                   help="DDIM steps (0 = full schedule)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_ema", action="store_true",
                   help="sample with the EMA weights (run must be trained "
                        "with --ema_decay > 0)")
    args = p.parse_args(argv)

    import jax

    from motiondiffusion_moe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.data import MotionNormalizer
    from motiondiffusion_moe_tpu.motion import (
        T2M_KINEMATIC_CHAIN, KIT_KINEMATIC_CHAIN, recover_from_ric)
    from motiondiffusion_moe_tpu.pipeline import GenerationPipeline
    from motiondiffusion_moe_tpu.training import CheckpointManager, Trainer
    from motiondiffusion_moe_tpu.utils.plot import (
        motion_temporal_filter, plot_3d_motion)

    cfg = ExperimentConfig.load(os.path.join(args.run_dir, "config.json"))
    trainer = Trainer(cfg)
    state = trainer.init_state()
    ckpt = CheckpointManager(os.path.join(args.run_dir, "ckpt"))
    restored = ckpt.restore(state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {args.run_dir}/ckpt")
    state, _ = restored
    print(f"[visualize] restored step {int(state.step)}")

    meta = os.path.join(args.run_dir, "meta")
    normalizer = (MotionNormalizer.load(meta) if os.path.exists(meta)
                  else MotionNormalizer.identity(cfg.data.dim_pose))

    from motiondiffusion_moe_tpu.training import select_params
    pipe = GenerationPipeline(
        cfg, trainer.model, select_params(state, args.use_ema),
        sampler=args.sampler,
        num_inference_steps=args.steps or None, micro_batch=1)
    motion = pipe.generate([args.text], [args.motion_length],
                           rng=jax.random.key(args.seed))[0]
    motion = normalizer.denormalize_np(motion)

    joints = np.asarray(recover_from_ric(motion, cfg.data.num_joints))
    joints = motion_temporal_filter(joints, sigma=1.0)
    if args.npy_path:
        np.save(args.npy_path, joints)
        print(f"[visualize] joints -> {args.npy_path}")

    chain = (T2M_KINEMATIC_CHAIN if cfg.data.dataset_name == "t2m"
             else KIT_KINEMATIC_CHAIN)
    plot_3d_motion(args.result_path, chain, joints, title=args.text, fps=20)
    print(f"[visualize] gif -> {args.result_path}")


if __name__ == "__main__":
    main()
