"""Minimal production-style HTTP serving front-end for text-to-motion.

Wraps one :class:`GenerationPipeline` (built from a ``tools/export.py``
artifact or a training run dir) behind a stdlib ``ThreadingHTTPServer``:

    POST /generate   {"texts": [...], "lengths": [...], "seed": 0,
                      "denormalize": true}
        -> {"motions": [[[...]...]], "shapes": [[len_i, D]], "step_ms": ...}
    GET  /healthz    -> {"ok": true, "model": ..., "sampler": ...}

Requests are serialized through one lock: the pipeline owns a single
compiled program per shape and the generate call already micro-batches,
overlapping device compute with host fetches (``pipeline.generate``), so
one in-flight generation keeps the chip busy; queueing at the HTTP layer
is the TPU-friendly concurrency model (one program, full MXU occupancy)
rather than racing dispatches from many threads.

No reference analog (the torch repo serves nothing; closest is
``trainers/ddpm_trainer.py:145-199`` driven by hand) — deployment polish
on top of the export artifact. Stdlib only: no extra dependencies.

Usage::

    python -m motiondiffusion_moe_tpu.tools.serve \
        --export_dir checkpoints/demo/export --port 8980 \
        --sampler ddim --steps 50 --micro_batch 8
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def make_server(pipe, host: str = "127.0.0.1", port: int = 0,
                denormalize: bool = True,
                max_batch: int = 64) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server around a ready pipeline.

    ``port=0`` binds an ephemeral port (tests); read it back from
    ``server.server_address[1]``. ``max_batch`` bounds one request's
    prompt count so a single caller can't queue an unbounded generation.
    """
    import jax

    lock = threading.Lock()
    normalizer = getattr(pipe, "normalizer", None)

    class Handler(BaseHTTPRequestHandler):
        # quiet: one access-log line per request goes to stdout via
        # log_message; keep it (ops-friendly) but drop the default noise
        def log_message(self, fmt, *args):  # pragma: no cover - cosmetic
            print(f"[serve] {self.address_string()} {fmt % args}")

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "unknown path"})
            self._reply(200, {
                "ok": True,
                "sampler": pipe.sampler,
                "micro_batch": pipe.micro_batch,
                "max_frames": pipe.cfg.model.max_frames,
                "compiled": pipe._compiled is not None,
            })

        def do_POST(self):
            if self.path != "/generate":
                return self._reply(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                texts = req["texts"]
                lengths = req["lengths"]
                if not isinstance(texts, list) or not isinstance(
                        lengths, list):
                    raise ValueError("texts and lengths must be lists")
                if len(texts) > max_batch:
                    raise ValueError(
                        f"{len(texts)} prompts > max_batch {max_batch}")
                seed = int(req.get("seed", 0))
                denorm = bool(req.get("denormalize", denormalize))
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                return self._reply(400, {"error": str(e)})
            try:
                t0 = time.perf_counter()
                with lock:
                    motions = pipe.generate(texts, lengths,
                                            rng=jax.random.key(seed))
                ms = 1e3 * (time.perf_counter() - t0)
                if denorm and normalizer is not None:
                    motions = [normalizer.denormalize_np(m) for m in motions]
                self._reply(200, {
                    "motions": [np.asarray(m).tolist() for m in motions],
                    "shapes": [list(np.asarray(m).shape) for m in motions],
                    "step_ms": round(ms, 2),
                })
            except ValueError as e:  # bad lengths etc. from generate()
                self._reply(400, {"error": str(e)})

    return ThreadingHTTPServer((host, port), Handler)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--export_dir",
                     help="serving artifact from tools/export.py")
    src.add_argument("--run_dir",
                     help="training run dir (config.json + ckpt/)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8980)
    p.add_argument("--sampler", default="ddim",
                   choices=["ddpm", "ddim", "dpm"])
    p.add_argument("--steps", type=int, default=50,
                   help="inference steps (0 = full schedule)")
    p.add_argument("--micro_batch", type=int, default=8)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--use_ema", action="store_true",
                   help="(--run_dir only) serve the EMA weights")
    p.add_argument("--param_dtype", default="", choices=["", "bfloat16"],
                   help="serving weight dtype (see GenerationPipeline)")
    p.add_argument("--no_denormalize", action="store_true",
                   help="return normalized feature space")
    p.add_argument("--warmup", action="store_true",
                   help="compile + run one generation before binding")
    args = p.parse_args(argv)

    from motiondiffusion_moe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from motiondiffusion_moe_tpu.pipeline import GenerationPipeline

    kw = dict(sampler=args.sampler, num_inference_steps=args.steps or None,
              micro_batch=args.micro_batch,
              param_dtype=args.param_dtype or None)
    if args.export_dir:
        pipe = GenerationPipeline.from_export(args.export_dir, **kw)
    else:
        import os

        from motiondiffusion_moe_tpu.config import ExperimentConfig
        from motiondiffusion_moe_tpu.data import MotionNormalizer
        from motiondiffusion_moe_tpu.training import (
            CheckpointManager, Trainer, select_params)

        cfg = ExperimentConfig.load(
            os.path.join(args.run_dir, "config.json"))
        trainer = Trainer(cfg)
        state = trainer.init_state()
        restored = CheckpointManager(
            os.path.join(args.run_dir, "ckpt")).restore(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {args.run_dir}/ckpt")
        state, _ = restored
        pipe = GenerationPipeline(
            cfg, trainer.model, select_params(state, args.use_ema), **kw)
        meta = os.path.join(args.run_dir, "meta")
        pipe.normalizer = (MotionNormalizer.load(meta)
                           if os.path.isdir(meta) else
                           MotionNormalizer.identity(cfg.data.dim_pose))

    if args.warmup:
        t0 = time.perf_counter()
        pipe.generate(["warmup"], [min(16, pipe.cfg.model.max_frames)])
        print(f"[serve] warmup compile+run "
              f"{time.perf_counter() - t0:.1f}s")

    server = make_server(pipe, args.host, args.port,
                         denormalize=not args.no_denormalize,
                         max_batch=args.max_batch)
    print(f"[serve] listening on http://{args.host}:"
          f"{server.server_address[1]} "
          f"(sampler={args.sampler}, steps={args.steps}, "
          f"micro_batch={args.micro_batch})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover
        print("[serve] shutting down")
        server.shutdown()


if __name__ == "__main__":
    main()
