"""Evaluation CLI.

Capability match of ``text2motion/tools/evaluation.py``:

    python -m motiondiffusion_moe_tpu.tools.evaluate \
        --run_dir ./checkpoints/t2m_moe_small [--dataset synthetic] \
        [--evaluator_ckpt path/to/finest.tar] [--glove_dir ./glove] \
        [--replication_times 20] [--sampler ddim --steps 50]

Replaces the reference's hardcoded cluster paths
(``datasets1/evaluator.py:24,175,183,322-329``) with flags. Without the
released ``finest.tar`` evaluator weights the metrics are computed with a
random-init evaluator (pipeline-valid, numbers not comparable) and the log
says so.
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np


def build_eval_samples(dataset, max_samples: int = 0) -> List["EvalSample"]:
    """EvalSamples (caption + tokens + GT motion) from a Text2MotionDataset
    (uses the dataset's parsed annotations, mirroring eval_mode=True,
    ``dataset1.py:143-163``)."""
    from motiondiffusion_moe_tpu.eval import EvalSample

    samples = []
    names = dataset.name_list[:max_samples] if max_samples else dataset.name_list
    for name in names:
        entry = dataset.data_dict[name]
        ann = entry["text"][0]
        motion = entry["motion"]
        m_length = entry["length"]
        max_len = dataset.cfg.max_motion_length
        if m_length > max_len:
            motion = motion[:max_len]
            m_length = max_len
        padded = np.zeros((max_len, motion.shape[1]), np.float32)
        padded[:m_length] = dataset.normalizer.normalize_np(motion[:m_length])
        samples.append(EvalSample(caption=ann.caption, tokens=list(ann.tokens),
                                  motion=padded, m_length=int(m_length)))
    return samples


def build_synthetic_eval_samples(cfg, n: int = 64, seed: int = 0
                                 ) -> List["EvalSample"]:
    from motiondiffusion_moe_tpu.data import SyntheticText2MotionDataset
    from motiondiffusion_moe_tpu.eval import EvalSample

    ds = SyntheticText2MotionDataset(cfg.data, size=n, seed=seed)
    samples = []
    for i in range(n):
        caption, motion, m_length = ds[i]
        tokens = [f"{w}/OTHER" for w in caption.split()]
        samples.append(EvalSample(caption=caption, tokens=tokens,
                                  motion=motion, m_length=m_length))
    return samples


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--dataset", default="real", choices=["real", "synthetic"])
    p.add_argument("--split", default="test")
    p.add_argument("--evaluator_ckpt", default="",
                   help="path to released finest.tar (FID backbone weights)")
    p.add_argument("--glove_dir", default="./glove")
    p.add_argument("--log_file", default="")
    p.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim", "dpm"])
    p.add_argument("--use_ema", action="store_true",
                   help="sample with the EMA weights (run must be trained "
                        "with --ema_decay > 0)")
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=32,
                   help="generation micro-batch (serving shape)")
    p.add_argument("--protocol_batch_size", type=int, default=512,
                   help="retrieval-pool size for R-precision/Matching "
                        "Score (the reference protocol uses 512, "
                        "tools/evaluation.py:423)")
    p.add_argument("--replication_times", type=int, default=20)
    p.add_argument("--mm_num_samples", type=int, default=100)
    p.add_argument("--mm_num_repeats", type=int, default=30)
    p.add_argument("--mm_num_times", type=int, default=10)
    p.add_argument("--diversity_times", type=int, default=300)
    p.add_argument("--max_samples", type=int, default=0,
                   help="cap the eval set size (0 = all)")
    p.add_argument("--score_samples", type=int, default=0,
                   help="cap the joint-space MAE/velocity/jerk scoring set "
                        "(0 = the FULL eval set, matching the reference's "
                        "whole-test-loader score loop)")
    p.add_argument("--skip_joint_scores", action="store_true")
    p.add_argument("--device_embeddings", action="store_true",
                   help="fuse generation with the evaluator motion encoder "
                        "in one device program and fetch 512-d embeddings "
                        "instead of raw motions (~100x less device->host "
                        "traffic; single-device pipelines only)")
    p.add_argument("--data_parallel", type=int, default=1,
                   help="shard each generation batch over this many devices"
                        " (batch_size must divide by it)")
    p.add_argument("--expert_parallel", type=int, default=1,
                   help="shard MoE experts over this many devices")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Megatron FFN split over this many devices")
    args = p.parse_args(argv)

    import jax

    from motiondiffusion_moe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from motiondiffusion_moe_tpu.config import ExperimentConfig
    from motiondiffusion_moe_tpu.data import MotionNormalizer, Text2MotionDataset
    from motiondiffusion_moe_tpu.eval import (
        EvaluatorModelWrapper, ProtocolConfig, evaluation,
        get_word_vectorizer, score_mae_velocity_jerk)
    from motiondiffusion_moe_tpu.eval.word_vectorizer import HashedWordVectorizer
    from motiondiffusion_moe_tpu.motion import recover_from_ric
    from motiondiffusion_moe_tpu.pipeline import GenerationPipeline
    from motiondiffusion_moe_tpu.training import CheckpointManager, Trainer

    cfg = ExperimentConfig.load(os.path.join(args.run_dir, "config.json"))
    trainer = Trainer(cfg)
    # host-side restore (serving_quality's round-5 tunnel lesson): eval
    # only needs the selected params on device — the pipeline places them
    # below — not the multi-GiB optimizer state, and the step read must
    # not be a device fetch (a 4-byte fetch can hang for minutes in a
    # remote-tunnel stall window)
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        state = trainer.init_state()
        ckpt = CheckpointManager(os.path.join(args.run_dir, "ckpt"))
        restored = ckpt.restore(state)
        if restored is None:
            raise FileNotFoundError(f"no checkpoint in {args.run_dir}/ckpt")
        state, _ = restored
    print(f"[evaluate] restored step {int(jax.device_get(state.step))}")

    meta = os.path.join(args.run_dir, "meta")
    normalizer = (MotionNormalizer.load(meta) if os.path.exists(meta)
                  else MotionNormalizer.identity(cfg.data.dim_pose))

    if args.dataset == "synthetic":
        samples = build_synthetic_eval_samples(cfg,
                                               n=args.max_samples or 64)
    else:
        ds = Text2MotionDataset(cfg.data, split=args.split,
                                normalizer=normalizer)
        samples = build_eval_samples(ds, args.max_samples)
    print(f"[evaluate] {len(samples)} eval samples")

    from motiondiffusion_moe_tpu.training import select_params
    mesh = None
    n_mesh = args.data_parallel * args.expert_parallel * args.tensor_parallel
    if n_mesh > 1:
        from motiondiffusion_moe_tpu.parallel import make_mesh
        mesh = make_mesh(n_mesh, expert_parallel=args.expert_parallel,
                         tensor_parallel=args.tensor_parallel)
        print(f"[evaluate] mesh {dict(mesh.shape)}")
    # under a mesh the model must be rebuilt with it (trainer.model carries
    # the TRAINING mesh, usually None in this CLI); trainer.cfg keeps any
    # moe_compute fallback the Trainer applied
    pipe = GenerationPipeline(trainer.cfg,
                              trainer.model if mesh is None else None,
                              select_params(state, args.use_ema),
                              sampler=args.sampler,
                              num_inference_steps=args.steps or None,
                              micro_batch=args.batch_size,
                              mesh=mesh)

    def generate(captions, lens, seed):
        return pipe.generate(captions, lens, rng=jax.random.key(seed))

    if args.evaluator_ckpt:
        wrapper = EvaluatorModelWrapper.from_torch_checkpoint(
            args.evaluator_ckpt, dim_pose=cfg.data.dim_pose,
            unit_length=cfg.data.unit_length)
        print("[evaluate] loaded evaluator weights from "
              f"{args.evaluator_ckpt}")
    else:
        wrapper = EvaluatorModelWrapper(dim_pose=cfg.data.dim_pose,
                                        unit_length=cfg.data.unit_length)
        print("[evaluate] WARNING: random-init evaluator (no finest.tar) — "
              "metric VALUES are not comparable to published numbers")

    wv = get_word_vectorizer(args.glove_dir)
    if isinstance(wv, HashedWordVectorizer):
        print("[evaluate] WARNING: GloVe files not found — hashed word "
              "vectors in use")

    log_file = args.log_file or os.path.join(args.run_dir, "evaluation.log")
    pcfg = ProtocolConfig(
        mm_num_samples=args.mm_num_samples,
        mm_num_repeats=args.mm_num_repeats,
        mm_num_times=args.mm_num_times,
        diversity_times=args.diversity_times,
        replication_times=args.replication_times,
        batch_size=args.protocol_batch_size,
        unit_length=cfg.data.unit_length,
        max_motion_length=cfg.data.max_motion_length,
        max_text_len=cfg.data.max_text_len)
    embed_generate = None
    if args.device_embeddings:
        if mesh is not None:
            print("[evaluate] WARNING: --device_embeddings unsupported "
                  "under a mesh; using the host path")
        else:
            def embed_generate(captions, lens, seed):
                return pipe.generate_motion_embeddings(
                    captions, lens, wrapper, rng=jax.random.key(seed))
    summary = evaluation(samples, generate, wrapper, wv, log_file, pcfg,
                         model_name=cfg.name, embed_generate=embed_generate)

    if not args.skip_joint_scores:
        # MAE / velocity / jerk in joint space over the ENTIRE eval set by
        # default, matching the reference's whole-test-loader score loop
        # (tools/evaluation.py:47-140, loop at :72-101); --score_samples
        # subsets explicitly, and either way the count is logged.
        n = (min(len(samples), args.score_samples) if args.score_samples
             else len(samples))
        print(f"[evaluate] joint-space scores over {n}/{len(samples)} "
              "samples")
        caps = [s.caption for s in samples[:n]]
        lens = [s.m_length for s in samples[:n]]
        outs = generate(caps, lens, 12345)
        T = cfg.data.max_motion_length
        D = cfg.data.dim_pose
        pred = np.zeros((n, T, D), np.float32)
        orig = np.zeros((n, T, D), np.float32)
        for i, (o, s) in enumerate(zip(outs, samples[:n])):
            pred[i, :o.shape[0]] = o[:T]
            orig[i] = s.motion
        pred = normalizer.denormalize_np(pred)
        orig = normalizer.denormalize_np(orig)
        pj = np.asarray(recover_from_ric(pred, cfg.data.num_joints))
        oj = np.asarray(recover_from_ric(orig, cfg.data.num_joints))
        mae, vel, jerk, _ = score_mae_velocity_jerk(pj, oj)
        print(f"[evaluate] MAE={mae.mean():.4f} velocity_err={vel:.4f} "
              f"jerk_err={jerk:.4f}")

    print(f"[evaluate] log -> {log_file}")


if __name__ == "__main__":
    main()
