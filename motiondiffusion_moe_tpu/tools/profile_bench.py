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


def capture(batch: int, steps: int, mode: str, log_dir: str,
            scan: int = 0) -> None:
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
    # healthy-shaped random params straight on device (real init costs
    # minutes; zeros are numerically degenerate for training backward —
    # see utils/bench_init.py)
    from motiondiffusion_moe_tpu.utils.bench_init import (
        random_benchmark_params)
    shapes = jax.eval_shape(
        lambda key: model.init({"params": key}, x, jnp.zeros((1,), jnp.int32),
                               jnp.full((1,), T, jnp.int32), text_ids=ids0),
        jax.random.key(0))
    params = random_benchmark_params(shapes)

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
            TrainState, make_optimizer, make_train_step)
        sched = make_schedule(schedule_name=cfg.diffusion.beta_schedule,
                              num_timesteps=cfg.diffusion.num_timesteps)
        tx = make_optimizer(cfg)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           opt_state=tx.init(params), tx=tx)
        rng = jax.random.key(1, impl=cfg.train.jax_rng_impl)
        batch_data = {
            "motion": jnp.zeros((B, T, D), jnp.float32),
            "length": jnp.full((B,), T, jnp.int32),
            "text_ids": jnp.asarray(hash_tokenize(
                ["a person walks"] * B, cfg.model.text_max_tokens)),
            "t": jnp.zeros((B,), jnp.int32),
            "t_weight": jnp.ones((B,), jnp.float32),
        }
        if scan > 1:
            # the production inner loop (make_multi_train_step): trace ONE
            # K-step scanned call; the analyzer's per-family totals then
            # cover K steps — divide by --scan for per-step numbers
            from motiondiffusion_moe_tpu.training.train_state import (
                make_multi_train_step)
            multi = make_multi_train_step(model, sched, cfg, jit=False)
            batches = jax.tree_util.tree_map(
                lambda a: jnp.broadcast_to(a[None], (scan,) + a.shape),
                batch_data)
            compiled = jax.jit(multi, donate_argnums=(0,)).lower(
                state, batches, rng).compile()
            _report_cost(compiled, scan)
            state, m = compiled(state, batches, rng)
            float(m["loss_total"][-1])
            with jax.profiler.trace(log_dir):
                state, m = compiled(state, batches, rng)
                float(m["loss_total"][-1])
        else:
            compiled = jax.jit(
                make_train_step(model, sched, cfg, jit=False),
                donate_argnums=(0,)).lower(state, batch_data, rng).compile()
            _report_cost(compiled, 1)
            state, m = compiled(state, batch_data, rng)   # first execution
            float(m["loss_total"])  # value fetch: the tunnel's true barrier
            with jax.profiler.trace(log_dir):
                state, m = compiled(state, batch_data, rng)
                float(m["loss_total"])


def _report_cost(compiled, scan: int) -> None:
    """XLA cost-analysis totals for the roofline decomposition (a lax.scan
    body is counted ONCE regardless of trip count, so these are per-step)."""
    try:
        cost = compiled.cost_analysis()
    except Exception as e:
        print(f"cost_analysis unavailable: {e}", file=sys.stderr)
        return
    if not cost:
        return
    flops = float(cost.get("flops", 0.0))
    byt = float(cost.get("bytes accessed", 0.0))
    print(f"cost analysis (per step, scan={scan}): "
          f"flops={flops/1e9:.1f}G  bytes_accessed={byt/2**30:.2f}GiB  "
          f"(mxu-floor {flops/197e12*1e3:.1f}ms @197T bf16; bytes are "
          "fusion-unaware — an upper bound on HBM traffic, ~3.5x the "
          "feasible traffic at measured step times, NOT a floor)",
          file=sys.stderr, flush=True)


def analyze(log_dir: str, top: int) -> None:
    """Parse the captured trace.json.gz into a device op-family table.

    (xprof's framework_op_stats converter emits gviz JSON that varies by
    version; the trace-event stream is stable, so parse it directly.)
    """
    import gzip
    import json
    import re

    traces = glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                       recursive=True)
    if not traces:
        print("no trace.json.gz captured", file=sys.stderr)
        return
    with gzip.open(sorted(traces)[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    ops = [e for e in ev if e.get("ph") == "X"
           and tids.get((e["pid"], e.get("tid"))) == "XLA Ops"]
    if not ops:
        print("no device ops in trace", file=sys.stderr)
        return

    fam = defaultdict(float)
    cnt = defaultdict(int)
    agg = defaultdict(float)
    acnt = defaultdict(int)
    total = 0.0
    for e in ops:
        base = re.split(r"[.\d]", e["name"])[0]
        if base == "while":     # the scan wrapper double-counts its body
            continue
        fam[base] += e["dur"]
        cnt[base] += 1
        agg[e["name"]] += e["dur"]
        acnt[e["name"]] += 1
        total += e["dur"]

    print(f"\n== op-family rollup (device total {total/1e3:.2f} ms; "
          f"'branch_' wraps each Pallas kernel) ==")
    for k in sorted(fam, key=lambda k: -fam[k])[:16]:
        print(f"  {k:36s} {fam[k]/1e3:9.3f} ms "
              f"{100*fam[k]/max(total,1e-9):5.1f}%  x{cnt[k]}")

    print(f"\n== top {top} ops by total time ==")
    for k in sorted(agg, key=lambda k: -agg[k])[:top]:
        print(f"  {agg[k]/1e3:8.3f} ms  x{acnt[k]:5d}  {k[:70]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--mode", default="sample", choices=["sample", "train"])
    ap.add_argument("--scan", type=int, default=0,
                    help="train mode: trace the K-step scanned program "
                         "(the production inner loop) instead of the "
                         "per-call step; family totals cover K steps")
    ap.add_argument("--log_dir", default=None)
    args = ap.parse_args()

    log_dir = args.log_dir or tempfile.mkdtemp(prefix="xprof_")
    capture(args.batch, args.steps, args.mode, log_dir, scan=args.scan)
    analyze(log_dir, args.top)
    if args.scan > 1:
        print(f"(scanned program: divide family totals by {args.scan} "
              "for per-step)", file=sys.stderr)
    print(f"\ntrace dir: {log_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
