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

Usage (after a training run, e.g. the round-5 soak):

    python -m motiondiffusion_moe_tpu.tools.serving_quality \
        --run_dir .soak/ckpts/soak_r5 [--use_ema] [--batch 32] \
        [--evaluator_ckpt path/to/finest.tar]

Prints one table; wall-clock dominated by XLA compiles (each
solver/step-count/dtype combination is its own program).

Tunnel discipline (the round-5 lesson — the first run of this tool hung
>10 min on a FOUR-BYTE ``int(state.step)`` fetch while the remote-chip
tunnel's download path sat in a stalled window, BENCH_NOTES.md round-5):

- the checkpoint restores on the HOST CPU backend — serving needs only
  the selected params on device (1.45 GB upload, the healthy direction),
  not the 5.4 GiB train state;
- every comparison (trajectory RMSE, evaluator-embedding distances, bf16
  drift) computes ON DEVICE in one jitted program per pair; sampled
  motions never leave HBM;
- the host fetches scalars only: one (checksum, nonfinite) sync pair per
  variant for timing/validation, then a single ``device_get`` for the
  whole stats table.
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
    import jax.numpy as jnp
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
    # host-side restore: init the template AND restore on the CPU backend,
    # so the multi-GiB optimizer state never crosses the tunnel and the
    # step read below is a host access, not a device fetch
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = trainer.init_state()
        ckpt = CheckpointManager(os.path.join(args.run_dir, "ckpt"))
        restored = ckpt.restore(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {args.run_dir}/ckpt")
        state, _ = restored
    params = select_params(state, args.use_ema)
    step0 = int(jax.device_get(state.step))
    print(f"[serving-quality] restored step {step0} (ema={args.use_ema}) "
          "on host", flush=True)

    B = args.batch
    T = cfg.data.max_motion_length
    ds = SyntheticText2MotionDataset(cfg.data, size=B, seed=7)
    captions = [ds[i][0] for i in range(B)]
    lengths = jnp.asarray(np.full((B,), T, np.int32))

    if args.evaluator_ckpt:
        wrapper = EvaluatorModelWrapper.from_torch_checkpoint(
            args.evaluator_ckpt, dim_pose=cfg.data.dim_pose,
            unit_length=cfg.data.unit_length)
        ev_kind = "finest.tar"
    else:
        wrapper = EvaluatorModelWrapper(dim_pose=cfg.data.dim_pose,
                                        unit_length=cfg.data.unit_length)
        ev_kind = "random-init (relative distances only)"
    unit = wrapper.unit_length

    # device params are shared across same-dtype pipelines (device_put on
    # an already-placed tree is a no-op) so each dtype uploads once
    placed = {}

    @jax.jit
    def sync_stats(m):
        # device-consumed validation sync: 2 scalars instead of the
        # [B, T, D] motions (bench.py's degraded-tunnel sampler mode)
        return jnp.sum(m * 1e-3), jnp.sum(~jnp.isfinite(m))

    @jax.jit
    def embed_dev(ev_params, m, lens):
        # same math as the fused eval path
        # (pipeline.generate_motion_embeddings): zero frames at/after each
        # length, movement-encode, then the masked-scan motion encoder
        mask = (jnp.arange(T)[None, :, None] < lens[:, None, None])
        m = jnp.where(mask, m, 0.0)
        movements = wrapper.movement_enc.apply(
            ev_params["movement"], m[..., :-4])
        return wrapper.motion_enc.apply(
            ev_params["motion"], movements, lens // unit)

    @jax.jit
    def pair_stats(x, ref, ex, eref):
        scale = jnp.sqrt(jnp.mean(ref ** 2))
        enorm = jnp.mean(jnp.linalg.norm(eref, axis=-1))
        traj = jnp.sqrt(jnp.mean((x - ref) ** 2)) / jnp.maximum(scale, 1e-8)
        emb = jnp.mean(jnp.linalg.norm(ex - eref, axis=-1)) \
            / jnp.maximum(enorm, 1e-8)
        return traj, emb

    @jax.jit
    def drift_stat(x, y, ref):
        scale = jnp.sqrt(jnp.mean(ref ** 2))
        return jnp.sqrt(jnp.mean((x - y) ** 2)) / jnp.maximum(scale, 1e-8)

    def sample(sampler, steps, dtype=None, seed=123):
        """One micro-batch sampled on device; returns the DEVICE array."""
        key = dtype or "f32"
        pipe = GenerationPipeline(cfg, trainer.model,
                                  placed.get(key, params),
                                  sampler=sampler,
                                  num_inference_steps=steps, micro_batch=B,
                                  param_dtype=dtype)
        placed[key] = pipe.params
        if pipe._compiled is None:
            pipe._compiled = pipe._sample_fn()
        ids_c = jnp.asarray(pipe.tokenize(captions))
        ids_u = jnp.asarray(pipe.tokenize([""] * B))
        name = (f"{sampler}{steps or cfg.diffusion.num_timesteps}"
                f"{' bf16' if dtype else ''}")
        # phase prints: through the remote tunnel a silent multi-minute
        # gap is ambiguous (server-side compile vs stalled fetch) — name
        # the phase so a hung run documents where it died
        print(f"[serving-quality] {name}: dispatching (compile on first "
              "touch)...", flush=True)
        t0 = time.time()
        m = pipe._compiled(pipe.params, ids_c, ids_u, lengths,
                           jax.random.key(seed))
        print(f"[serving-quality] {name}: dispatched "
              f"{time.time() - t0:.1f}s; value-fetch sync...", flush=True)
        chk, nonfinite = jax.device_get(sync_stats(m))
        dt = time.time() - t0
        assert int(nonfinite) == 0, f"{name}: {int(nonfinite)} non-finite"
        print(f"[serving-quality] {name}: sampled in {dt:.1f}s "
              f"(incl. compile; checksum {float(chk):.3f})", flush=True)
        return m

    # the probability-flow reference: full-schedule deterministic DDIM, f32
    ref = sample("ddim", None)
    variants = [("ddim50", "ddim", 50, None),
                ("dpm20", "dpm", 20, None),
                ("dpm10", "dpm", 10, None)]
    if not args.skip_bf16:
        variants += [("ddim50-bf16", "ddim", 50, "bfloat16"),
                     ("dpm20-bf16", "dpm", 20, "bfloat16")]
    outs = {name: sample(s, st, dt) for name, s, st, dt in variants}

    emb_ref = embed_dev(wrapper.params, ref, lengths)
    stats = {}
    for name, x in outs.items():
        ex = embed_dev(wrapper.params, x, lengths)
        stats[name] = pair_stats(x, ref, ex, emb_ref)
    drifts = {}
    if not args.skip_bf16:
        for a, b in (("ddim50", "ddim50-bf16"), ("dpm20", "dpm20-bf16")):
            drifts[a] = drift_stat(outs[b], outs[a], ref)
    # ONE host fetch for the whole table
    print("[serving-quality] fetching stats table (one device_get)...",
          flush=True)
    stats, drifts = jax.device_get((stats, drifts))

    print(f"\n[serving-quality] checkpoint step {step0}, "
          f"B={B}, T={T}, evaluator: {ev_kind}")
    print(f"{'variant':<14} {'traj RMSE/rms':>14} {'emb dist (rel)':>15}")
    for name, (traj, emb) in stats.items():
        print(f"{name:<14} {float(traj):>14.4f} {float(emb):>15.4f}")
    # bf16 drift isolated from solver error: bf16 vs the SAME solver in f32
    for a, d in drifts.items():
        print(f"bf16 drift {a}: {float(d):.5f} "
              "(traj RMSE/rms vs same-solver f32)")


if __name__ == "__main__":
    main()
