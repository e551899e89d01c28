"""Export a trained run as a self-contained SERVING artifact.

The training checkpoint layout (orbax, full ``TrainState``) carries the
Adam moments — 2x the parameter mass — plus the RNG stream and resume
metadata, and restoring it requires rebuilding a :class:`Trainer` to get
a structural template. None of that is needed to serve. This tool writes
a deployment directory:

    export/
      config.json       # the run's ExperimentConfig (round-trips)
      params.msgpack    # ONE flax-msgpack blob: {"params": ...} variables
      meta/             # normalizer mean/std (when the run has them)
      export.json       # provenance: step, ema, dtype

which :meth:`GenerationPipeline.from_export` loads with no Trainer, no
optimizer state and no orbax template dance. ``--dtype bfloat16`` stores
the denoiser weights bf16 (same leaf rule as the pipeline's serving cast:
FAVOR+ random-feature projections stay float32), halving the artifact and
the per-step HBM weight reads.

No reference analog (the torch repo deploys raw training checkpoints,
``trainers/ddpm_trainer.py:383-393``); this is deployment polish on top.

Usage::

    python -m motiondiffusion_moe_tpu.tools.export \
        --run_dir ./checkpoints/t2m_moe --use_ema --dtype bfloat16
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def cast_serving_dtype(params, dtype_name: str):
    """Cast float32 leaves to the serving dtype, EXCEPT the FAVOR+
    random-feature projections (they define the attention feature map and
    the fused kernels evaluate them at full precision — see
    ``GenerationPipeline._place_params``). Host-side numpy, no device."""
    if dtype_name in ("", "float32", None):
        return params
    import jax
    import jax.numpy as jnp

    dtype = jnp.dtype(dtype_name)

    def cast(path, leaf):
        leaf = np.asarray(leaf)
        if "projection" in jax.tree_util.keystr(path) \
                or leaf.dtype != np.float32:
            return leaf
        return leaf.astype(dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def export_run(run_dir: str, out_dir: str = "", *, step=None,
               use_ema: bool = False, dtype: str = "float32") -> str:
    """Write the serving artifact; returns the export directory path."""
    import flax.serialization as fser
    import jax

    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.training import (
        CheckpointManager, Trainer, select_params)

    cfg = ExperimentConfig.load(os.path.join(run_dir, "config.json"))
    trainer = Trainer(cfg)
    state = trainer.init_state()
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    restored = ckpt.restore(state, step=step)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint in {run_dir}/ckpt")
    state, _ = restored
    params = select_params(state, use_ema)  # raises if --use_ema w/o EMA
    params = jax.device_get(params)
    params = cast_serving_dtype(params, dtype)

    out_dir = out_dir or os.path.join(run_dir, "export")
    os.makedirs(out_dir, exist_ok=True)
    cfg.save(os.path.join(out_dir, "config.json"))
    with open(os.path.join(out_dir, "params.msgpack"), "wb") as f:
        f.write(fser.msgpack_serialize(
            fser.to_state_dict(params), in_place=True))
    meta = os.path.join(run_dir, "meta")
    if os.path.isdir(meta):
        from motiondiffusion_moe_tpu.data import MotionNormalizer
        MotionNormalizer.load(meta).save(os.path.join(out_dir, "meta"))
    with open(os.path.join(out_dir, "export.json"), "w") as f:
        json.dump({"step": int(state.step), "use_ema": bool(use_ema),
                   "dtype": dtype or "float32"}, f, indent=2)
    print(f"[export] step {int(state.step)} "
          f"(ema={use_ema}, dtype={dtype or 'float32'}) -> {out_dir}")
    return out_dir


def load_export(export_dir: str):
    """Load an export dir -> (cfg, params, normalizer)."""
    import flax.serialization as fser

    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.data import MotionNormalizer

    cfg = ExperimentConfig.load(os.path.join(export_dir, "config.json"))
    with open(os.path.join(export_dir, "params.msgpack"), "rb") as f:
        params = fser.msgpack_restore(f.read())
    meta = os.path.join(export_dir, "meta")
    normalizer = (MotionNormalizer.load(meta) if os.path.isdir(meta)
                  else MotionNormalizer.identity(cfg.data.dim_pose))
    return cfg, params, normalizer


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--run_dir", required=True,
                   help="training run dir (config.json + ckpt/)")
    p.add_argument("--out", default="",
                   help="output dir (default <run_dir>/export)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default latest)")
    p.add_argument("--use_ema", action="store_true",
                   help="export the EMA weights (run must be trained with "
                        "--ema_decay > 0)")
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="stored weight dtype (bfloat16 halves the artifact; "
                        "FAVOR projections stay float32)")
    args = p.parse_args(argv)
    export_run(args.run_dir, args.out, step=args.step,
               use_ema=args.use_ema, dtype=args.dtype)


if __name__ == "__main__":
    main()
