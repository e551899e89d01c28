"""Serving-defaults quality measurement on TRAINED weights.

Validates the two serving-surface claims that were previously backed only
by toy-model / random-init evidence (VERDICT r3 weak #6):

- few-step solver quality: strided DDIM-50 (the headline sampler) and
  DPM-Solver++(2M) at 20/10 steps, each compared against the full-schedule
  deterministic DDIM trajectory (the probability-flow reference all
  few-step solvers approximate — same methodology as
  ``tests/test_dpm_quality.py``, now on a real checkpoint);
- bf16-resident serving weights: trajectory drift of ``param_dtype=
  bfloat16`` (the ``tools/export.py`` serving cast) vs the f32 weights.

Usage (after a training run, e.g. the round-4 soak):

    python -m motiondiffusion_moe_tpu.tools.serving_quality \
        --run_dir .soak/soak_r4 [--use_ema] [--batch 8] \
        [--evaluator_ckpt path/to/finest.tar]

Prints one table; wall-clock dominated by XLA compiles (each
solver/step-count/dtype combination is its own program).
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--evaluator_ckpt", default="",
                   help="released finest.tar weights; random-init evaluator "
                        "(relative distances only) when absent")
    p.add_argument("--skip_bf16", action="store_true")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from motiondiffusion_moe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.data import SyntheticText2MotionDataset
    from motiondiffusion_moe_tpu.eval import EvaluatorModelWrapper
    from motiondiffusion_moe_tpu.pipeline import GenerationPipeline
    from motiondiffusion_moe_tpu.training import (
        CheckpointManager, Trainer, select_params)

    cfg = ExperimentConfig.load(os.path.join(args.run_dir, "config.json"))
    trainer = Trainer(cfg)
    state = trainer.init_state()
    ckpt = CheckpointManager(os.path.join(args.run_dir, "ckpt"))
    restored = ckpt.restore(state)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {args.run_dir}/ckpt")
    state, _ = restored
    params = select_params(state, args.use_ema)
    print(f"[serving-quality] restored step {int(state.step)} "
          f"(ema={args.use_ema})")

    B = args.batch
    T = cfg.data.max_motion_length
    ds = SyntheticText2MotionDataset(cfg.data, size=B, seed=7)
    captions = [ds[i][0] for i in range(B)]
    lens = [T] * B

    def sample(sampler, steps, dtype=None, seed=123):
        pipe = GenerationPipeline(cfg, trainer.model, params,
                                  sampler=sampler,
                                  num_inference_steps=steps, micro_batch=B,
                                  param_dtype=dtype)
        t0 = time.time()
        outs = pipe.generate(captions, lens, rng=jax.random.key(seed))
        dt = time.time() - t0
        x = np.stack([np.asarray(o, np.float32) for o in outs])
        assert np.isfinite(x).all(), f"{sampler}-{steps}-{dtype}: non-finite"
        print(f"[serving-quality] {sampler}"
              f"{steps or cfg.diffusion.num_timesteps}"
              f"{' bf16' if dtype else ''}: sampled in {dt:.1f}s "
              "(incl. compile)")
        return x

    # the probability-flow reference: full-schedule deterministic DDIM, f32
    ref = sample("ddim", None)
    variants = [("ddim50", "ddim", 50, None),
                ("dpm20", "dpm", 20, None),
                ("dpm10", "dpm", 10, None)]
    if not args.skip_bf16:
        variants += [("ddim50-bf16", "ddim", 50, "bfloat16"),
                     ("dpm20-bf16", "dpm", 20, "bfloat16")]
    outs = {name: sample(s, st, dt) for name, s, st, dt in variants}

    scale = float(np.sqrt(np.mean(ref ** 2)))

    if args.evaluator_ckpt:
        wrapper = EvaluatorModelWrapper.from_torch_checkpoint(
            args.evaluator_ckpt, dim_pose=cfg.data.dim_pose,
            unit_length=cfg.data.unit_length)
        ev_kind = "finest.tar"
    else:
        wrapper = EvaluatorModelWrapper(dim_pose=cfg.data.dim_pose,
                                        unit_length=cfg.data.unit_length)
        ev_kind = "random-init (relative distances only)"
    lens64 = np.full((B,), T, np.int64)

    def embed(x):
        return np.asarray(wrapper.get_motion_embeddings(x, lens64))

    emb_ref = embed(ref)
    emb_norm = max(float(np.linalg.norm(emb_ref, axis=-1).mean()), 1e-8)

    print(f"\n[serving-quality] checkpoint step {int(state.step)}, "
          f"B={B}, T={T}, evaluator: {ev_kind}")
    print(f"{'variant':<14} {'traj RMSE/rms':>14} {'emb dist (rel)':>15}")
    for name, x in outs.items():
        traj = float(np.sqrt(np.mean((x - ref) ** 2))) / max(scale, 1e-8)
        emb = float(np.linalg.norm(embed(x) - emb_ref, axis=-1).mean())
        print(f"{name:<14} {traj:>14.4f} {emb / emb_norm:>15.4f}")
    # bf16 drift isolated from solver error: bf16 vs the SAME solver in f32
    if not args.skip_bf16:
        for a, b in (("ddim50", "ddim50-bf16"), ("dpm20", "dpm20-bf16")):
            d = float(np.sqrt(np.mean((outs[b] - outs[a]) ** 2)))
            print(f"bf16 drift {a}: {d / max(scale, 1e-8):.5f} "
                  "(traj RMSE/rms vs same-solver f32)")


if __name__ == "__main__":
    main()
