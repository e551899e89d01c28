"""Convert a training run's checkpoint between block-parameter layouts.

The two layouts are the named per-block tree (``block_low_0`` ...,
``scan_blocks=False``) and the nn.scan stacked tree (``blocks_low/block``
with a leading [L] layer axis, ``scan_blocks=True`` — required for
pipeline parallelism, ~Lx smaller traced program). The conversion is an
exact reshuffle (``models.transformer.stack_block_params`` /
``unstack_block_params``): params AND the Adam moments convert, so
training resumes bit-identically in the new layout.

No reference analog (the reference has a single fixed module layout);
this exists because the TPU build offers both.

Usage::

    python -m motiondiffusion_moe_tpu.tools.convert_checkpoint \
        --run_dir checkpoints/my_run --to stacked [--out <dir>] [--step N]

The output directory gets a converted ``config.json`` (``scan_blocks``
flipped), a copy of the run's ``meta/`` (normalizer stats), and the
converted checkpoint — a run directory ``tools/evaluate.py`` /
``tools/visualize.py`` accept via ``--run_dir`` as-is. To RESUME TRAINING
from it, point train.py at the converted run dir via its two
run-locating flags — ``tools/train.py --checkpoint_dir <parent of out>
--name <basename of out>`` — with the original flags ADJUSTED to the new
layout (``--scan_blocks`` added or dropped): train.py rewrites
``config.json`` from its CLI args, so the flags must describe the
converted layout or the orbax restore template will not match the
checkpoint.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Any


def _has_block_keys(tree: Any) -> bool:
    return isinstance(tree, dict) and any(
        k.startswith("block_low_") or k == "blocks_low" for k in tree)


def _looks_like_variables(obj: Any) -> bool:
    return (isinstance(obj, dict) and isinstance(obj.get("params"), dict)
            and _has_block_keys(obj["params"]))


def _convert_variables(variables: dict, convert) -> dict:
    """Apply the layout conversion to EVERY collection holding per-block
    subtrees — not just 'params': init()-time sown collections
    (moe_losses/moe_metrics) ride along in TrainState.params and the Adam
    moment trees, and their layout must match the target template too."""
    out = {}
    for coll, tree in variables.items():
        if _has_block_keys(tree):
            out[coll] = convert({"params": tree})["params"]
        else:
            out[coll] = tree
    return out


def convert_state_tree(obj: Any, convert) -> Any:
    """Apply ``convert`` to every variables-shaped subtree (the params and
    each Adam-moment tree mirror the same structure); everything else
    (counts, scalars, nested optax NamedTuples) passes through."""
    if _looks_like_variables(obj):
        return _convert_variables(obj, convert)
    if isinstance(obj, tuple):
        vals = [convert_state_tree(v, convert) for v in obj]
        return type(obj)(*vals) if hasattr(obj, "_fields") else tuple(vals)
    if isinstance(obj, list):
        return [convert_state_tree(v, convert) for v in obj]
    if isinstance(obj, dict):
        return {k: convert_state_tree(v, convert) for k, v in obj.items()}
    return obj


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True,
                   help="training run dir (contains config.json + ckpt/)")
    p.add_argument("--to", required=True, choices=["stacked", "named"])
    p.add_argument("--out", default="",
                   help="output run dir (default: <run_dir>_<to>)")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step (default: latest)")
    args = p.parse_args(argv)

    import jax

    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.models import (
        MotionTransformer, stack_block_params, unstack_block_params)
    from motiondiffusion_moe_tpu.training import (
        CheckpointManager, create_train_state)

    cfg = ExperimentConfig.load(os.path.join(args.run_dir, "config.json"))
    to_stacked = args.to == "stacked"
    if cfg.model.scan_blocks == to_stacked:
        raise SystemExit(
            f"run is already in the {args.to!r} layout "
            f"(config.json: scan_blocks={cfg.model.scan_blocks})")

    # template state in the SOURCE layout (cheap CPU init)
    src_model = MotionTransformer(config=cfg.model)
    template = create_train_state(src_model, cfg, jax.random.key(0))
    mngr = CheckpointManager(os.path.join(args.run_dir, "ckpt"))
    out = mngr.restore_with_rng(template, args.step)
    if out is None:
        raise SystemExit(f"no checkpoint found under {args.run_dir}/ckpt")
    state, epoch, rng = out
    step = int(state.step)
    mngr.close()

    convert = stack_block_params if to_stacked else unstack_block_params
    new_state = state.replace(
        params=_convert_variables(state.params, convert),
        opt_state=convert_state_tree(state.opt_state, convert),
        ema_params=(_convert_variables(state.ema_params, convert)
                    if getattr(state, "ema_params", None) is not None
                    else None))

    new_cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model,
                                       scan_blocks=to_stacked))
    out_dir = args.out or (args.run_dir.rstrip("/") + f"_{args.to}")
    os.makedirs(out_dir, exist_ok=True)
    new_cfg.save(os.path.join(out_dir, "config.json"))
    # the run's meta/ (normalizer stats) must ride along: evaluate.py /
    # visualize.py fall back to an identity normalizer when it is absent
    meta_src = os.path.join(args.run_dir, "meta")
    if os.path.isdir(meta_src):
        import shutil
        shutil.copytree(meta_src, os.path.join(out_dir, "meta"),
                        dirs_exist_ok=True)
    out_mngr = CheckpointManager(os.path.join(out_dir, "ckpt"))
    out_mngr.save(step, new_state, epoch, rng=rng)
    out_mngr.wait()
    out_mngr.close()
    n = len(jax.tree_util.tree_leaves(new_state.params))
    print(f"[convert_checkpoint] {args.run_dir} (step {step}) -> "
          f"{out_dir} [{args.to}] ({n} param leaves; optimizer moments "
          f"converted; rng {'kept' if rng is not None else 'absent'})")


if __name__ == "__main__":
    main()
