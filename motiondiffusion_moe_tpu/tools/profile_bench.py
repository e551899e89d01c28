"""Capture an XProf trace of the flagship 50-step sampler and print the
device op-time breakdown (top ops + op-family rollup).

The driver for perf work: identifies which op families (matmul / LN /
convert / copy / kernel) dominate the device timeline, so optimization
targets the measured bottleneck rather than guesses.

Usage::

    python -m motiondiffusion_moe_tpu.tools.profile_bench \
        [--batch 32] [--steps 50] [--top 30] [--mode sample|train]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
from collections import defaultdict


def capture(batch: int, steps: int, mode: str, log_dir: str) -> None:
    import jax
    import jax.numpy as jnp

    from motiondiffusion_moe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.models import MotionTransformer
    from motiondiffusion_moe_tpu.models.text_encoder import hash_tokenize

    cfg = ExperimentConfig.moe_small()
    model = MotionTransformer(config=cfg.model)
    B, T, D = batch, cfg.model.max_frames, cfg.model.input_feats
    x = jnp.zeros((1, T, D))
    ids0 = jnp.asarray(hash_tokenize(["warmup"], cfg.model.text_max_tokens))
    # zero params straight on device (timing is value-independent; real
    # init costs minutes whenever the compile cache is cold — see bench.py)
    shapes = jax.eval_shape(
        lambda key: model.init({"params": key}, x, jnp.zeros((1,), jnp.int32),
                               jnp.full((1,), T, jnp.int32), text_ids=ids0),
        jax.random.key(0))
    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes))()

    if mode == "sample":
        from motiondiffusion_moe_tpu.pipeline import GenerationPipeline
        pipe = GenerationPipeline(cfg, model, params, sampler="ddim",
                                  num_inference_steps=steps, micro_batch=B)
        captions = ["a person walks forward and turns around"] * B
        lens = [T] * B
        print("compiling...", file=sys.stderr, flush=True)
        pipe.generate(captions, lens, rng=jax.random.key(0))  # compile
        print("tracing...", file=sys.stderr, flush=True)
        with jax.profiler.trace(log_dir):
            pipe.generate(captions, lens, rng=jax.random.key(1))
        print("trace done", file=sys.stderr, flush=True)
    else:
        from motiondiffusion_moe_tpu.diffusion import make_schedule
        from motiondiffusion_moe_tpu.training.train_state import (
            create_train_state, make_train_step)
        sched = make_schedule(schedule_name=cfg.diffusion.beta_schedule,
                              num_timesteps=cfg.diffusion.num_timesteps)
        state = create_train_state(model, cfg, jax.random.key(0))
        step_fn = make_train_step(model, sched, cfg)
        rng = jax.random.key(1)
        batch_data = {
            "motion": jnp.zeros((B, T, D), jnp.float32),
            "length": jnp.full((B,), T, jnp.int32),
            "text_ids": jnp.asarray(hash_tokenize(
                ["a person walks"] * B, cfg.model.text_max_tokens)),
            "t": jnp.zeros((B,), jnp.int32),
            "t_weight": jnp.ones((B,), jnp.float32),
        }
        state, _ = step_fn(state, batch_data, rng)   # compile
        jax.block_until_ready(state.params)
        with jax.profiler.trace(log_dir):
            state, _ = step_fn(state, batch_data, rng)
            jax.block_until_ready(state.params)


def analyze(log_dir: str, top: int) -> None:
    """Parse the xplane capture into a per-op table via xprof."""
    from xprof.convert import raw_to_tool_data

    xplanes = glob.glob(os.path.join(log_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane.pb captured", file=sys.stderr)
        return
    params = {"tqx": "out:csv;"}
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, "framework_op_stats", params)
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")

    import csv
    import io
    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        print("empty op stats", file=sys.stderr)
        return

    def f(row, key):
        try:
            return float(row.get(key, 0) or 0)
        except ValueError:
            return 0.0

    # keep device (TPU) ops only
    dev = [r for r in rows if (r.get("host_or_device") or "").lower()
           not in ("host",)]
    total = sum(f(r, "total_self_time_in_us") for r in dev)
    fam = defaultdict(float)
    for r in dev:
        name = (r.get("operation_name") or r.get("op_name") or "?")
        cat = (r.get("category") or "?")
        fam[cat] += f(r, "total_self_time_in_us")
    print(f"\n== op-family rollup (device total {total/1e3:.2f} ms) ==")
    for cat, us in sorted(fam.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:40s} {us/1e3:9.3f} ms  {100*us/max(total,1e-9):5.1f}%")

    print(f"\n== top {top} ops by self time ==")
    dev.sort(key=lambda r: -f(r, "total_self_time_in_us"))
    for r in dev[:top]:
        name = (r.get("operation_name") or r.get("op_name") or "?")[:70]
        cat = (r.get("category") or "?")[:24]
        us = f(r, "total_self_time_in_us")
        occ = int(f(r, "number_of_occurrences") or f(r, "occurrences"))
        print(f"  {us/1e3:8.3f} ms  x{occ:5d}  [{cat}] {name}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--mode", default="sample", choices=["sample", "train"])
    ap.add_argument("--log_dir", default=None)
    args = ap.parse_args()

    log_dir = args.log_dir or tempfile.mkdtemp(prefix="xprof_")
    capture(args.batch, args.steps, args.mode, log_dir)
    analyze(log_dir, args.top)
    print(f"\ntrace dir: {log_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
