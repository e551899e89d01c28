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

# wall-clock budget for the WHOLE bench (the driver kills the process at
# ~600 s; rc=124 with no JSON is the round-4 failure mode this guards
# against). Diagnostics are skipped once the budget would be exceeded;
# 0 disables the guard.
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "500"))
_T_START = time.time()
_PHASE = ["startup"]


def _remaining() -> float:
    return (BUDGET_S - (time.time() - _T_START)) if BUDGET_S > 0 else 1e9


def _log(msg: str) -> None:
    import sys
    import time as _t
    _PHASE[0] = msg
    print(f"# [{_t.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def _start_watchdog() -> None:
    """Heartbeat thread: names the in-flight phase every 30 s on stderr so
    a driver-side timeout still documents WHERE the bench died (round-4's
    rc=124 left only 'compiling sampler...' as the last word)."""
    import sys
    import threading

    def beat():
        while True:
            time.sleep(30)
            print(f"# [watchdog] t={time.time()-_T_START:.0f}s "
                  f"phase: {_PHASE[0]}", file=sys.stderr, flush=True)

    threading.Thread(target=beat, daemon=True).start()


def _probe_tunnel(deadline_s: float = 120.0) -> dict:
    """Two-stage device round-trip probe with hard deadlines.

    The axon tunnel's measured failure mode (rounds 4-5) is DISPATCHES
    FINE, FETCHES STALL/CRAWL. Stage 1 (put + 4-byte fetch) gates
    everything: if even a scalar can't come back, every measurement below
    would hang until the driver kills us — report the stall instead.
    Stage 2 (1 MB fetch, 60 s) only CLASSIFIES bandwidth: a hang there
    means scalar-fetch workloads still work but bulk downloads don't
    (fetch1mb=None -> callers switch to device-consumed mode).
    Returns {ok, put, fetch_scalar, fetch1mb | None}.
    """
    import threading

    res: dict = {"ok": False}

    def stage1():
        import jax
        import jax.numpy as jnp
        t0 = time.time()
        x = jnp.ones((4,))
        x.block_until_ready()
        res["put"] = time.time() - t0
        t0 = time.time()
        jax.device_get(x)
        res["fetch_scalar"] = time.time() - t0
        res["ok"] = True

    th = threading.Thread(target=stage1, daemon=True)
    th.start()
    th.join(deadline_s)
    if not res.get("ok"):
        return res

    def stage2():
        import jax
        import jax.numpy as jnp
        # time the FETCH alone: materialize + sync first, or the probe
        # charges the tunnel for this program's compile/execute (measured
        # ~2 s for a cold random.normal — enough to misclassify a healthy
        # ~14 MB/s link as degraded and silently switch the headline to
        # device-consumed mode)
        x = jnp.ones((262144,), jnp.float32)
        x.block_until_ready()
        jax.device_get(x[:8])  # sync: block_until_ready is not a barrier here
        t0 = time.time()
        jax.device_get(x)
        res["fetch1mb"] = time.time() - t0

    th2 = threading.Thread(target=stage2, daemon=True)
    th2.start()
    th2.join(60.0)
    if "fetch1mb" not in res:
        res["fetch1mb"] = None  # bulk path hung; scalar path is alive
    return res


def main() -> None:
    import contextlib
    import io
    import sys

    _start_watchdog()
    # the axon tunnel and libraries print noise to stdout during compile;
    # the driver expects EXACTLY one JSON line, so run everything with
    # stdout captured and emit the result at the end.
    captured = io.StringIO()
    with contextlib.redirect_stdout(captured):
        result, diag, diag_fns = _run()
    # emit the headline IMMEDIATELY: the diagnostics below can involve
    # multi-minute XLA compiles and must never hold it hostage
    print(json.dumps(result), flush=True)
    print(diag, file=sys.stderr, flush=True)
    for fn in diag_fns:
        if _remaining() < 150:
            # a cold diag compile through the tunnel costs minutes; better
            # a skipped diagnostic than a driver-killed process (rc=124
            # loses the already-printed headline's exit status)
            print(f"# diag skipped: {_remaining():.0f}s of "
                  f"BENCH_BUDGET_S={BUDGET_S:.0f} left", file=sys.stderr,
                  flush=True)
            continue
        try:
            with contextlib.redirect_stdout(captured):
                line = fn()
            print(line, file=sys.stderr, flush=True)
        except Exception as e:  # diagnostics only — never sink the headline
            print(f"# diag bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
    noise = captured.getvalue().strip()
    if noise:
        print(f"# suppressed stdout: {noise[:500]}", file=sys.stderr)
    sys.stderr.flush()
    sys.stdout.flush()
    # a stalled-fetch daemon thread (see _probe_tunnel) can wedge the
    # interpreter's exit teardown; the output is flushed, leave hard
    os._exit(0)


def _run():
    import jax
    import jax.numpy as jnp

    from motiondiffusion_moe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.models import MotionTransformer
    from motiondiffusion_moe_tpu.pipeline import GenerationPipeline

    # micro-batch 16 measured best under pipelined fetches (16: 19.49,
    # 32: 19.45 motions/s on v5e); 24 reps = sustained throughput over 384
    # motions with the warm-up/tail amortized (6: 19.49, 12: 19.88,
    # 24: 19.99), ~20 s timing region
    batch = int(os.environ.get("BENCH_BATCH", "16"))
    steps = int(os.environ.get("BENCH_STEPS", "50"))
    layers = int(os.environ.get("BENCH_LAYERS", "8"))
    reps = int(os.environ.get("BENCH_REPS", "24"))

    # Degraded CPU fallback: if the TPU tunnel is unreachable jax lands on
    # the CPU backend, where the flagship 24-rep sampling run would take
    # hours (and the driver's bench window would expire with NO record).
    # Shrink to a minimal-but-honest run and say so in the metric name
    # rather than hanging. Explicit BENCH_* env overrides still win.
    cpu_fallback = (jax.default_backend() == "cpu"
                    and os.environ.get("BENCH_ALLOW_FULL_CPU", "0") != "1")
    reduced_fetch = os.environ.get("BENCH_REDUCED_FETCH", "") == "1"

    # Preflight: one tiny device round-trip with a deadline. The tunnel's
    # measured degradation mode is stalled device->host fetches (r4's
    # rc=124; r5 measured a 4-byte fetch hanging >300 s while dispatches
    # stayed fast). A stalled probe means generate() below would hang
    # until the driver kills us with NO record — report the stall as the
    # result instead (value 0.0, explained metric string).
    if not cpu_fallback:
        _log("preflight tunnel probe...")
        probe = _probe_tunnel(deadline_s=float(
            os.environ.get("BENCH_PROBE_DEADLINE_S", "120")))
        if not probe.get("ok"):
            _log("tunnel probe STALLED - reporting and exiting")
            return ({
                "metric": ("motions/sec/chip (196 frames, 50-step DDIM "
                           "CFG, flagship MoE) - NOT MEASURED: TPU tunnel "
                           "stalled (device fetch hung past the probe "
                           "deadline). Last committed chip measurements: "
                           "BENCH_SELF_r05.json (20.89 motions/s, "
                           "6.47x) / BENCH_NOTES.md round-5"),
                "value": 0.0,
                "unit": "motions/s/chip",
                "vs_baseline": 0.0,
            }, "# tunnel probe stalled; no measurement possible", [])
        f1 = probe.get("fetch1mb")
        _log(f"tunnel ok: put={probe['put']:.2f}s "
             f"scalar={probe['fetch_scalar']:.2f}s "
             f"fetch1mb={'HUNG' if f1 is None else f'{f1:.2f}s'}")
        if f1 is None or f1 > 2.0:
            # Degraded-but-alive DOWNLOAD path (measured r5: uploads at
            # ~28 MB/s while device->host fetches crawled at <0.5 MB/s).
            # Each rep fetches ~3.3 MB of motions; at that rate the
            # "throughput" would measure the tunnel, not the chip. Switch
            # the headline to device-side consumption: the SAME compiled
            # sampler, outputs reduced on-device to (checksum,
            # nonfinite-count) scalars, one value-fetch sync at the end.
            # Production TPU hosts read results over PCIe/DMA at GB/s —
            # the tunnel's bad day is an artifact of this environment.
            reduced_fetch = True
            _log(f"fetch degraded "
                 f"({'hung' if f1 is None else f'{f1:.1f}s'}/MB): "
                 "device-side consumption mode")

    if cpu_fallback:
        batch = int(os.environ.get("BENCH_BATCH", "4"))
        steps = int(os.environ.get("BENCH_STEPS", "10"))
        layers = int(os.environ.get("BENCH_LAYERS", "2"))
        reps = int(os.environ.get("BENCH_REPS", "1"))
        os.environ.setdefault("BENCH_TRAIN", "0")
        os.environ.setdefault("BENCH_DPM", "0")
        _log("TPU backend unavailable - degraded CPU fallback "
             f"(batch={batch} steps={steps} layers={layers} reps={reps})")

    from dataclasses import replace

    cfg = ExperimentConfig.moe_small()
    if layers != cfg.model.num_layers:
        cfg = replace(cfg, model=replace(cfg.model, num_layers=layers))
    # A/B knob for per-block rematerialization in the TRAIN diag (the
    # sampler has no backward; remat only changes the training program):
    # BENCH_REMAT=dots|dots_named|all (see ModelConfig.remat_blocks)
    remat = os.environ.get("BENCH_REMAT")
    if remat:
        cfg = replace(cfg, model=replace(cfg.model, remat_blocks=remat))
    # A/B knob for the nn.scan stacked-block layout (ModelConfig.
    # scan_blocks): ~Lx smaller traced program — measures the compile-time
    # win and any runtime delta from the scan's fusion boundaries
    if os.environ.get("BENCH_SCAN_BLOCKS", "0") == "1":
        cfg = replace(cfg, model=replace(cfg.model, scan_blocks=True))
    run_sampler = os.environ.get("BENCH_SAMPLER", "1") != "0"

    model = MotionTransformer(config=cfg.model)

    # Benchmark params: HEALTHY-SHAPED randoms in the real param tree,
    # created in one jitted program on the chip (real flax init of the
    # 363M flagship costs minutes on the 1-core host). All-zeros params —
    # the old trick — are numerically degenerate for TRAINING: the
    # L2-stabilization backward amplifies zero-norm rows by 1e12 and the
    # first update is NaN (see utils/bench_init.py).
    from motiondiffusion_moe_tpu.models.text_encoder import hash_tokenize
    from motiondiffusion_moe_tpu.utils.bench_init import (
        random_benchmark_params)
    B, T, D = batch, cfg.model.max_frames, cfg.model.input_feats
    x = jnp.zeros((1, T, D))
    ids0 = jnp.asarray(hash_tokenize(["warmup"], cfg.model.text_max_tokens))
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k}, x, jnp.zeros((1,), jnp.int32),
                             jnp.full((1,), T, jnp.int32), text_ids=ids0),
        jax.random.key(0))
    _log("creating benchmark params on device...")
    params = random_benchmark_params(shapes)
    jax.block_until_ready(params)
    _log("params ready")

    # serving weight precision (see GenerationPipeline.param_dtype):
    # weights stored bf16 on device halve the sampler's per-step
    # weight-read traffic; drift measured in tests/test_pipeline.py
    serve_dtype = os.environ.get("BENCH_SERVE_DTYPE") or None

    if run_sampler:
        pipe = GenerationPipeline(cfg, model, params, sampler="ddim",
                                  num_inference_steps=steps, micro_batch=B,
                                  param_dtype=serve_dtype)
        captions = ["a person walks forward and turns around"] * B
        lens = [T] * B
        import numpy as np

        if reduced_fetch:
            compile_s, elapsed = _timed_sampler_reduced(
                pipe, captions, lens, reps)
        else:
            # warmup/compile
            _log("compiling sampler...")
            t0 = time.time()
            warm = pipe.generate(captions, lens, rng=jax.random.key(0))
            compile_s = time.time() - t0
            # a NaN-producing kernel regression must not hide behind a
            # good throughput number: the motions have to be finite
            assert all(np.isfinite(m).all() for m in warm), \
                "benchmark sampler produced non-finite motions"
            _log(f"sampler compiled in {compile_s:.1f}s; timing...")

            # one generate over reps*B prompts: micro-batches are
            # dispatched asynchronously, so chunk i+1's compute overlaps
            # chunk i's fetch (the pipeline's serving behavior)
            t0 = time.time()
            pipe.generate(captions * reps, lens * reps,
                          rng=jax.random.key(1))
            elapsed = time.time() - t0

        motions_per_sec = (B * reps) / elapsed
        metric = ("motions/sec/chip (196 frames, 50-step DDIM CFG, "
                  "flagship MoE)")
        if reduced_fetch:
            metric += (" [device-consumed outputs: tunnel fetch degraded,"
                       " result readback excluded]")
        if cpu_fallback:
            metric = ("motions/sec (DEGRADED CPU FALLBACK - TPU tunnel "
                      f"unreachable; {steps}-step, {layers}-layer)")
        result = {
            "metric": metric,
            "value": round(motions_per_sec, 4),
            # the degraded CPU run is not per-chip and not comparable to
            # the TPU baseline: don't emit a meaningless ratio
            "unit": ("motions/s/chip" if not cpu_fallback
                     else "motions/s (CPU, degraded)"),
            "vs_baseline": (round(motions_per_sec / BASELINE_MOTIONS_PER_SEC,
                                  4) if not cpu_fallback else 0.0),
        }
        diag = (f"# compile={compile_s:.1f}s run={elapsed:.2f}s batch={B} "
                f"steps={steps} layers={layers} "
                f"serve_dtype={serve_dtype or 'float32'} "
                f"reduced_fetch={reduced_fetch} "
                f"backend={jax.default_backend()}")
    else:
        # train-diag-only mode (BENCH_SAMPLER=0) for perf iteration —
        # never what the driver runs
        result = {"metric": "train-only run", "value": 0.0, "unit": "-",
                  "vs_baseline": 0.0}
        diag = "# sampler skipped (BENCH_SAMPLER=0)"

    diag_fns = []
    if run_sampler and os.environ.get("BENCH_DPM", "1") != "0":
        # DPM-Solver++(2M) throughput at 10 steps: substantiates the
        # "10-20 steps for a further ~Nx" claim with a measured number
        # (trajectory error vs the full-schedule solver is measured in
        # tests/test_dpm_quality.py — this line is the speed half)
        diag_fns.append(lambda: _dpm_diag(cfg, model, params, B, T,
                                          serve_dtype, reduced_fetch))
    if os.environ.get("BENCH_TRAIN", "1") != "0":
        # training benchmark at the reference's TRAIN batch size (32), not
        # the sampling micro-batch
        diag_fns.append(lambda: _train_diag(
            cfg, model, params, cfg.train.batch_size, T, D))
    diag_fns.append(_soak_diag)
    return result, diag, diag_fns


def _timed_sampler_reduced(pipe, captions, lens, reps):
    """Time the compiled sampler with outputs consumed ON DEVICE.

    Used when the tunnel's device->host fetch path is degraded (measured
    r5: <0.5 MB/s down vs ~28 MB/s up): the normal pipeline fetch of
    ~3.3 MB of motions per micro-batch would dominate the timing and
    measure the tunnel, not the chip. Here the same jitted sampler's
    output is reduced to (checksum, nonfinite-count) scalars in one fused
    program; reps are dispatched back-to-back and the final VALUE fetch is
    the sync (block_until_ready is not a barrier through this tunnel —
    BENCH_NOTES r3). Returns (compile_s, elapsed_s)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    sample = pipe._sample_fn()

    def reduced(params, ids_c, ids_u, lengths, seed):
        # key derived in-graph: eager per-rep key construction would pay
        # a multi-second eager-dispatch round trip each through the tunnel
        rng = jax.random.fold_in(jax.random.key(100), seed)
        m = sample(params, ids_c, ids_u, lengths, rng)
        return jnp.sum(m), jnp.sum(~jnp.isfinite(m))

    fn = jax.jit(reduced)
    ids_c = jnp.asarray(pipe.tokenize(list(captions)))
    ids_u = jnp.asarray(pipe.tokenize([""] * len(captions)))
    lengths = jnp.asarray(np.asarray(lens, np.int32))

    _log("compiling sampler (device-consumed)...")
    t0 = time.time()
    _, bad = fn(pipe.params, ids_c, ids_u, lengths, 0)
    bad = int(bad)
    compile_s = time.time() - t0
    assert bad == 0, f"sampler produced {bad} non-finite values"
    _log(f"sampler compiled in {compile_s:.1f}s; timing "
         f"({reps} reps, device-consumed)...")
    t0 = time.time()
    outs = [fn(pipe.params, ids_c, ids_u, lengths, 1 + i)
            for i in range(reps)]
    last_bad = int(outs[-1][1])  # value fetch = the only sync
    elapsed = time.time() - t0
    assert last_bad == 0, f"non-finite values in timed reps ({last_bad})"
    return compile_s, elapsed


def _soak_diag() -> str:
    """Report the committed sustained-training (soak) summary, if one
    exists: >=500 flagship optimizer steps on the chip with a mid-run
    checkpoint -> kill -> resume (produced by tools/soak_report.py from
    the train-CLI logs; see BENCH_NOTES.md 'round-5 soak')."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".soak_summary.json")
    if not os.path.exists(path):
        return "# soak: no .soak_summary.json (no sustained run recorded)"
    with open(path) as f:
        s = json.load(f)
    rates = "/".join(f"{r:.2f}" for r in s.get("sustained_steps_per_s", []))
    return (f"# soak: steps={s['total_steps']} halves={s['halves']} "
            f"loss={s['loss_first']:.3f}->{s['loss_last']:.3f} "
            f"trend_ok={s['loss_decreasing']} "
            f"resume_continues={s.get('resume_step_continues', 'n/a')}/"
            f"{s.get('resume_loss_continues', 'n/a')} "
            f"sustained_steps_per_s={rates}")


def _dpm_diag(cfg, model, params, B, T, serve_dtype=None,
              reduced_fetch: bool = False) -> str:
    """Measured DPM-Solver++(2M) sampling throughput (stderr diagnostic)."""
    import jax

    from motiondiffusion_moe_tpu.pipeline import GenerationPipeline

    steps = int(os.environ.get("BENCH_DPM_STEPS", "10"))
    reps = int(os.environ.get("BENCH_DPM_REPS", "12"))
    pipe = GenerationPipeline(cfg, model, params, sampler="dpm",
                              num_inference_steps=steps, micro_batch=B,
                              param_dtype=serve_dtype)
    captions = ["a person walks forward and turns around"] * B
    lens = [T] * B
    if reduced_fetch:
        compile_s, elapsed = _timed_sampler_reduced(pipe, captions, lens,
                                                    reps)
    else:
        _log(f"compiling {steps}-step DPM-Solver++ sampler...")
        t0 = time.time()
        warm = pipe.generate(captions, lens, rng=jax.random.key(0))
        compile_s = time.time() - t0
        import numpy as np
        assert all(np.isfinite(m).all() for m in warm), \
            "DPM benchmark produced non-finite motions"
        _log(f"DPM sampler compiled in {compile_s:.1f}s; timing...")
        t0 = time.time()
        pipe.generate(captions * reps, lens * reps, rng=jax.random.key(1))
        elapsed = time.time() - t0
    mps = (B * reps) / elapsed
    return (f"# dpm{steps}: motions/s={mps:.2f} "
            f"({1.0 / mps * 1000:.1f} ms/motion) batch={B} reps={reps} "
            f"compile={compile_s:.1f}s reduced_fetch={reduced_fetch} "
            f"vs_baseline={mps / BASELINE_MOTIONS_PER_SEC:.1f}x")


def _train_diag(cfg, model, params, B, T, D) -> str:
    """Flagship train-step benchmark (diagnostics only, stderr):
    step time at the training batch size, motion-frames/s, and an MFU
    estimate from XLA's cost analysis. Training is the reference's hot
    loop (trainers/ddpm_trainer.py:313-352) — without this number,
    training-perf regressions are invisible to the driver loop."""
    import jax
    import jax.numpy as jnp

    from motiondiffusion_moe_tpu.diffusion import make_schedule
    from motiondiffusion_moe_tpu.models.text_encoder import hash_tokenize
    from motiondiffusion_moe_tpu.training.train_state import (
        TrainState, make_optimizer, make_train_step)

    # A/B knob for the Adam moment storage dtypes (the update runs at the
    # f32 HBM roofline — see TrainConfig.adam_mu_dtype/adam_nu_dtype)
    adam_dt = os.environ.get("BENCH_ADAM_DTYPE")
    if adam_dt:
        from dataclasses import replace
        cfg = replace(cfg, train=replace(cfg.train, adam_mu_dtype=adam_dt,
                                         adam_nu_dtype=adam_dt))
    # A/B knob for gradient accumulation (TrainConfig.grad_accum_steps):
    # the scanned stacked-block layout (BENCH_SCAN_BLOCKS=1) saves each
    # scale's activations as ONE [L, ...] buffer and OOMs HBM at K=32
    # (17.11 vs 15.75 GB, BENCH_NOTES r3) — accumulation cuts the live
    # activation set ~A-fold at one extra grads buffer
    accum = int(os.environ.get("BENCH_TRAIN_ACCUM", "1"))
    if accum > 1:
        from dataclasses import replace
        cfg = replace(cfg, train=replace(cfg.train, grad_accum_steps=accum))

    sched = make_schedule(schedule_name=cfg.diffusion.beta_schedule,
                          num_timesteps=cfg.diffusion.num_timesteps)
    tx = make_optimizer(cfg)
    # ONE jitted program for the optimizer-state zeros: eager tree_map
    # init dispatches ~2x leaf-count device ops (each paying the tunnel's
    # per-dispatch latency — seconds when degraded)
    _log("initializing optimizer state on device...")
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=jax.jit(tx.init)(params), tx=tx)

    batch = {
        "motion": jnp.zeros((B, T, D), jnp.float32),
        "length": jnp.full((B,), T, jnp.int32),
        "text_ids": jnp.asarray(hash_tokenize(
            ["a person walks"] * B, cfg.model.text_max_tokens)),
        "t": jnp.linspace(0, 999, B).astype(jnp.int32),
        "t_weight": jnp.ones((B,), jnp.float32),
    }
    if accum > 1:
        # the accumulating step wants host-chunked [A, B/A, ...] leaves
        # (Trainer._chunk's layout)
        batch = {k: v.reshape(accum, B // accum, *v.shape[1:])
                 for k, v in batch.items()}
    # the Trainer's training-stream default: TPU-native RngBitGenerator
    # (cfg.train.rng_impl — threefry dropout masks cost ~77 ms/step here)
    rng = jax.random.key(0, impl=cfg.train.jax_rng_impl)

    # The scanned K-step program (training.make_multi_train_step) is the
    # DEFAULT train benchmark: it is the production inner loop, and it
    # amortizes both the per-call host/control-plane cost and the remote
    # tunnel's large one-time program-load cost over K steps. FLOPs come
    # from XLA's cost analysis of the same program; XLA counts a
    # lax.scan body ONCE regardless of trip count (verified on CPU:
    # flops(K=1) == flops(K=8)), so the body count IS the per-step count.
    # Sync discipline: fetch a VALUE, never block_until_ready — through
    # the remote-chip tunnel block_until_ready can return before the
    # program actually executes.
    import math

    reps = int(os.environ.get("BENCH_TRAIN_REPS", "5"))
    out_lines = []

    if os.environ.get("BENCH_TRAIN_PERCALL", "0") == "1":
        # optional: the step-per-dispatch cadence (the reference's Python
        # loop shape). Pays a multi-minute first-execution program load on
        # the tunnel, so off by default.
        _log("compiling train step...")
        t0 = time.time()
        compiled = jax.jit(make_train_step(model, sched, cfg, jit=False),
                           donate_argnums=(0,)).lower(state, batch,
                                                      rng).compile()
        compile_s = time.time() - t0
        _log(f"train step compiled in {compile_s:.1f}s; timing...")
        flops1 = None
        try:
            cost = compiled.cost_analysis()
            if cost:
                flops1 = float(cost.get("flops", 0.0)) or None
        except Exception:
            pass
        state, metrics = compiled(state, batch, rng)
        warm_loss = float(metrics["loss_total"])
        t0 = time.time()
        for _ in range(reps):
            state, metrics = compiled(state, batch, rng)
        last_loss = float(metrics["loss_total"])
        step_s = (time.time() - t0) / reps
        assert math.isfinite(last_loss), (
            f"train bench diverged: loss={last_loss} (warmup {warm_loss})")
        line = (f"# train: step={step_s*1000:.1f}ms batch={B} "
                f"frames/s={B*T/step_s:.0f} loss={warm_loss:.3f}->"
                f"{last_loss:.3f} compile={compile_s:.1f}s")
        if flops1:
            line += (f" flops/step={flops1/1e9:.1f}G "
                     f"mfu={flops1/step_s/197e12*100:.1f}%")
        out_lines.append(line)

    # K=32 measured best (same-session sweep: K=8 93.7 ms, K=16 88.8,
    # K=32 86.6 / 28.3% MFU — the per-dispatch host cost amortizes to
    # nothing); the stacked K-batch buffer is ~2.6 GB at K=32, well within
    # v5e HBM next to the 363M-param f32 train state.
    K = int(os.environ.get("BENCH_TRAIN_SCAN", "32"))
    from motiondiffusion_moe_tpu.training.train_state import (
        make_multi_train_step)

    _log(f"compiling {K}-step scanned train program...")
    multi = make_multi_train_step(model, sched, cfg, jit=False)
    batches = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (K,) + x.shape), batch)
    t0 = time.time()
    compiled_m = jax.jit(multi, donate_argnums=(0,)).lower(
        state, batches, rng).compile()
    mcompile_s = time.time() - t0
    flops = hbm_bytes = None
    try:
        cost = compiled_m.cost_analysis()
        if cost:
            # NO /K: cost_analysis counts the scan body once (per-step)
            flops = (float(cost.get("flops", 0.0)) or None)
            # per-step HBM traffic: the roofline's other axis (819 GB/s
            # on v5e) — the MFU ceiling for this memory-bound-leaning
            # step is min(1, peak_time/step) with both floors printed
            hbm_bytes = (float(cost.get("bytes accessed", 0.0)) or None)
    except Exception:
        pass
    _log(f"scanned program compiled in {mcompile_s:.1f}s; timing...")
    state, ms = compiled_m(state, batches, rng)
    warm = float(ms["loss_total"][0])
    mreps = max(1, reps // 2)
    t0 = time.time()
    for _ in range(mreps):
        state, ms = compiled_m(state, batches, rng)
    mlast = float(ms["loss_total"][-1])
    mstep_s = (time.time() - t0) / mreps / K
    assert math.isfinite(mlast), (
        f"scanned train bench diverged: loss={mlast} (first {warm})")
    line = (f"# train-scan{K}: step={mstep_s*1000:.1f}ms batch={B}"
            + (f" accum={accum}" if accum > 1 else "")
            + f" frames/s={B*T/mstep_s:.0f} loss={warm:.3f}->{mlast:.3f} "
            f"compile={mcompile_s:.1f}s")
    if flops:
        line += (f" flops/step={flops/1e9:.1f}G "
                 f"mfu={flops/mstep_s/197e12*100:.1f}%")
    if hbm_bytes:
        # XLA's "bytes accessed" is fusion-unaware (sums every HLO op's
        # operand+result bytes; measured ~3.5x the feasible traffic at
        # this step time) — report it as the upper bound it is, with the
        # MXU floor as the only defensible roofline floor
        line += (f" mxu-floor={flops/197e12*1e3:.1f}ms "
                 f"xla-bytes/step={hbm_bytes/2**30:.0f}GiB "
                 "(fusion-unaware upper bound)")
    try:
        # real device HBM numbers (validates the analytical memory
        # accounting, e.g. pp_stage_memory_report's activation terms)
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        if peak:
            line += (f" hbm-peak={peak/2**30:.2f}GiB"
                     f"/{stats.get('bytes_limit', 0)/2**30:.2f}GiB")
    except Exception:
        pass
    out_lines.append(line)
    out = "\n".join(out_lines)
    return out


if __name__ == "__main__":
    main()
