"""Headline benchmark: motions/sec/chip at 196 frames, 50-step DDIM.

Runs the flagship MoE denoiser (the reference's live config:
latent 512, ff 256, 8 layers x 2 scales, 4 experts top-2, 196x263
HumanML3D features) through the jit-compiled 50-step strided-DDIM CFG
sampler on the available chip and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference README claims 0.31 s/motion inference
(README.md:82-86, hardware unspecified) -> 3.226 motions/s.
"""

from __future__ import annotations

import json
import os
import time

BASELINE_MOTIONS_PER_SEC = 1.0 / 0.31


def main() -> None:
    import contextlib
    import io
    import sys

    # the axon tunnel and libraries print noise to stdout during compile;
    # the driver expects EXACTLY one JSON line, so run everything with
    # stdout captured and emit the result at the end.
    captured = io.StringIO()
    with contextlib.redirect_stdout(captured):
        result, diag = _run()
    print(json.dumps(result))
    print(diag, file=sys.stderr)
    noise = captured.getvalue().strip()
    if noise:
        print(f"# suppressed stdout: {noise[:500]}", file=sys.stderr)


def _run():
    import jax
    import jax.numpy as jnp

    from motiondiffusion_moe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.models import MotionTransformer
    from motiondiffusion_moe_tpu.pipeline import GenerationPipeline

    batch = int(os.environ.get("BENCH_BATCH", "32"))  # measured sweet spot (16: -11%, 64: -8%)
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    layers = int(os.environ.get("BENCH_LAYERS", "8"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    cfg = ExperimentConfig.moe_small()
    if layers != cfg.model.num_layers:
        from dataclasses import replace
        cfg = replace(cfg, model=replace(cfg.model, num_layers=layers))

    model = MotionTransformer(config=cfg.model)

    # init on the host CPU backend (fast compile), then ship to the chip
    from motiondiffusion_moe_tpu.models.text_encoder import hash_tokenize
    B, T, D = batch, cfg.model.max_frames, cfg.model.input_feats
    x = jnp.zeros((1, T, D))
    ids0 = jnp.asarray(hash_tokenize(["warmup"], cfg.model.text_max_tokens))
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = jax.jit(lambda k: model.init(
            {"params": k}, x, jnp.zeros((1,), jnp.int32),
            jnp.full((1,), T, jnp.int32), text_ids=ids0))(jax.random.key(0))
    params = jax.device_put(params, jax.devices()[0])

    pipe = GenerationPipeline(cfg, model, params, sampler="ddim",
                              num_inference_steps=steps, micro_batch=B)
    captions = ["a person walks forward and turns around"] * B
    lens = [T] * B

    # warmup/compile
    t0 = time.time()
    pipe.generate(captions, lens, rng=jax.random.key(0))
    compile_s = time.time() - t0

    t0 = time.time()
    for r in range(reps):
        pipe.generate(captions, lens, rng=jax.random.key(r + 1))
    elapsed = time.time() - t0

    motions_per_sec = (B * reps) / elapsed
    result = {
        "metric": "motions/sec/chip (196 frames, 50-step DDIM CFG, flagship MoE)",
        "value": round(motions_per_sec, 4),
        "unit": "motions/s/chip",
        "vs_baseline": round(motions_per_sec / BASELINE_MOTIONS_PER_SEC, 4),
    }
    diag = (f"# compile={compile_s:.1f}s run={elapsed:.2f}s batch={B} "
            f"steps={steps} layers={layers} backend={jax.default_backend()}")
    return result, diag


if __name__ == "__main__":
    main()
