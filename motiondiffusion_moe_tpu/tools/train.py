"""Training CLI.

Capability match of ``text2motion/tools/train.py`` with the single-source
config replacing the argparse/opt.txt split truth (SURVEY.md §5):

    python -m motiondiffusion_moe_tpu.tools.train --name my_run \
        --dataset t2m --data_root ./data/HumanML3D --batch_size 32

The config is serialized to ``<checkpoint_dir>/<name>/config.json`` and
round-trips for evaluate/visualize (the ``opt.txt`` analog,
``options/base_options.py:77-87`` / ``utils/get_opt.py:30-92``).
"""

from __future__ import annotations

import argparse
import dataclasses
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train the MoE motion diffusion model")
    p.add_argument("--name", default="t2m_moe_small")
    p.add_argument("--dataset", default="t2m", choices=["t2m", "kit", "synthetic"])
    p.add_argument("--data_root", default="./data/HumanML3D")
    p.add_argument("--checkpoint_dir", default="./checkpoints")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--num_epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--diffusion_steps", type=int, default=1000)
    p.add_argument("--beta_schedule", default="linear",
                   choices=["linear", "cosine", "sqrt"])
    p.add_argument("--schedule_sampler", default="uniform",
                   choices=["uniform", "loss-second-moment", "adaptive-loss"])
    p.add_argument("--num_layers", type=int, default=8)
    p.add_argument("--latent_dim", type=int, default=512)
    p.add_argument("--ff_size", type=int, default=256)
    p.add_argument("--num_heads", type=int, default=4)
    p.add_argument("--num_experts", type=int, default=4)
    p.add_argument("--no_moe", action="store_true")
    p.add_argument("--model_size", default="small", choices=["small", "big"])
    p.add_argument("--text_encoder", default="hash",
                   choices=["hash", "deberta-v3-large", "deberta-tiny"])
    p.add_argument("--deberta_ckpt", default="",
                   help="local HF DeBERTa checkpoint (dir with "
                        "pytorch_model.bin, or a .bin/.pt file) grafted "
                        "into the text encoder at init; without it a "
                        "deberta text_encoder trains from RANDOM init "
                        "(warned)")
    p.add_argument("--text_latent_dim", type=int, default=128)
    p.add_argument("--times", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--save_latest", type=int, default=500)
    p.add_argument("--save_every_e", type=int, default=5)
    p.add_argument("--no_uncond_step", action="store_true")
    p.add_argument("--steps_per_call", type=int, default=1,
                   help="optimizer steps per compiled call (lax.scan inner "
                        "loop; amortizes per-dispatch host cost)")
    p.add_argument("--grad_accum", type=int, default=1,
                   help="gradient-accumulation microbatches per optimizer "
                        "update (batch_size must divide evenly; cuts "
                        "activation memory ~A-fold)")
    p.add_argument("--rng_impl", default="rbg",
                   choices=["rbg", "threefry"],
                   help="training PRNG: rbg = TPU-native RngBitGenerator "
                        "(faster); threefry = partition-invariant streams")
    p.add_argument("--adam_mu_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="Adam first-moment storage dtype")
    p.add_argument("--adam_nu_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="Adam second-moment storage dtype")
    p.add_argument("--remat_blocks", default="",
                   choices=["", "dots", "dots_named", "all"],
                   help="per-decoder-block rematerialization policy "
                        "(memory-vs-FLOPs; useful for bigger models)")
    p.add_argument("--scan_blocks", action="store_true",
                   help="run each U-Net scale's blocks as one nn.scan over "
                        "stacked [L,...] params (~Lx smaller traced "
                        "program; same math)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="weight-EMA decay (0 = off; e.g. 0.9999). Sample "
                        "with --use_ema in evaluate/visualize")
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine"])
    p.add_argument("--lr_warmup_steps", type=int, default=0,
                   help="linear 0 -> lr warmup steps")
    p.add_argument("--lr_decay_steps", type=int, default=0,
                   help="total steps for the cosine decay (incl. warmup)")
    p.add_argument("--caption_dropout", type=float, default=0.0)
    p.add_argument("--w_velocity", type=float, default=0.0)
    p.add_argument("--w_acceleration", type=float, default=0.0)
    p.add_argument("--w_structure", type=float, default=0.0)
    p.add_argument("--w_progressive", type=float, default=0.0)
    p.add_argument("--expert_parallel", type=int, default=1,
                   help="EP degree: experts sharded over this many devices")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="TP degree: FFN hidden dims column/row-sharded")
    p.add_argument("--data_parallel", type=int, default=0,
                   help="DP degree; 0 = auto (all devices on an accelerator"
                        " backend, single-device on CPU)")
    p.add_argument("--seq_parallel", type=int, default=1,
                   help="SP degree: activations sharded on the frame axis"
                        " (pick a divisor of max_frames and max_frames//2)")
    p.add_argument("--pipeline_parallel", type=int, default=1,
                   help="PP degree: GPipe stages over the stacked decoder"
                        " blocks (requires --scan_blocks; composes with DP"
                        " only)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches (0 = 2x the PP degree)")
    p.add_argument("--zero1", action="store_true",
                   help="ZeRO-1: shard Adam moments + EMA over the data"
                        " axis (reduce-scatter grads, sharded update,"
                        " all-gather updates)")
    p.add_argument("--synthetic_size", type=int, default=256,
                   help="synthetic dataset size (dataset=synthetic)")
    p.add_argument("--no_native_io", action="store_true",
                   help="disable the C++ batch-assembly data plane")
    # multi-host (pod) launch — the torchrun-env analog of the reference
    # (tools/train.py:88-100). On TPU pods all three are auto-detected;
    # pass them only for manual/localhost launches. batch_size stays the
    # GLOBAL batch; each process loads batch_size/num_processes rows.
    p.add_argument("--coordinator_address", default="",
                   help="host:port of process 0 (multi-host; auto on pods)")
    p.add_argument("--num_processes", type=int, default=0,
                   help="total process count (multi-host; auto on pods)")
    p.add_argument("--process_id", type=int, default=-1,
                   help="this process's rank (multi-host; auto on pods)")
    return p


def config_from_args(args: argparse.Namespace):
    from motiondiffusion_moe_tpu.config import (
        DataConfig, DiffusionConfig, ExperimentConfig, ModelConfig,
        ParallelConfig, TrainConfig)

    if args.dataset == "kit":
        data = DataConfig.kit(data_root=args.data_root, times=args.times,
                              use_native_io=not args.no_native_io)
    else:
        data = DataConfig.humanml3d(data_root=args.data_root,
                                    times=args.times,
                                    use_native_io=not args.no_native_io)

    # "big" doubles latent/ff/text dims (transformer.py:188-192)
    mult = 2 if args.model_size == "big" else 1
    model = ModelConfig(
        input_feats=data.dim_pose, max_frames=data.max_motion_length,
        latent_dim=args.latent_dim * mult, ff_size=args.ff_size * mult,
        num_layers=args.num_layers, num_heads=args.num_heads,
        use_moe=not args.no_moe, num_experts=args.num_experts,
        text_encoder=args.text_encoder,
        text_encoder_ckpt=args.deberta_ckpt,
        text_latent_dim=args.text_latent_dim * mult,
        remat_blocks=args.remat_blocks,
        scan_blocks=args.scan_blocks,
        pipeline_microbatches=args.pp_microbatches)

    return ExperimentConfig(
        name=args.name,
        checkpoint_dir=args.checkpoint_dir,
        data=data,
        diffusion=DiffusionConfig(num_timesteps=args.diffusion_steps,
                                  beta_schedule=args.beta_schedule,
                                  schedule_sampler=args.schedule_sampler),
        model=model,
        parallel=ParallelConfig(num_expert_partitions=args.expert_parallel,
                                num_model_partitions=args.tensor_parallel,
                                num_data_partitions=args.data_parallel,
                                num_seq_partitions=args.seq_parallel,
                                num_pipeline_stages=args.pipeline_parallel,
                                zero1=args.zero1),
        train=TrainConfig(batch_size=args.batch_size,
                          num_epochs=args.num_epochs, lr=args.lr,
                          seed=args.seed,
                          steps_per_call=args.steps_per_call,
                          grad_accum_steps=args.grad_accum,
                          rng_impl=args.rng_impl,
                          adam_mu_dtype=args.adam_mu_dtype,
                          adam_nu_dtype=args.adam_nu_dtype,
                          uncond_step=not args.no_uncond_step,
                          caption_dropout=args.caption_dropout,
                          ema_decay=args.ema_decay,
                          lr_schedule=args.lr_schedule,
                          lr_warmup_steps=args.lr_warmup_steps,
                          lr_decay_steps=args.lr_decay_steps,
                          log_every=args.log_every,
                          save_latest_every=args.save_latest,
                          save_every_epochs=args.save_every_e,
                          w_velocity=args.w_velocity,
                          w_acceleration=args.w_acceleration,
                          w_structure=args.w_structure,
                          w_progressive=args.w_progressive))


def main(argv=None) -> None:
    args = build_argparser().parse_args(argv)
    cfg = config_from_args(args)

    # Multi-host init MUST precede the first device touch (backend
    # instantiation makes jax.distributed.initialize impossible — see
    # parallel/distributed.py). The reference's analog is
    # dist.init_process_group('nccl', env://) (tools/train.py:95-100).
    from motiondiffusion_moe_tpu.parallel.distributed import (
        initialize_distributed, is_primary, local_batch_slice)
    initialize_distributed(
        coordinator_address=args.coordinator_address or None,
        num_processes=args.num_processes or None,
        process_id=args.process_id if args.process_id >= 0 else None)

    import jax

    from motiondiffusion_moe_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from motiondiffusion_moe_tpu.data import (
        DataLoader, DistributedSampler, SyntheticText2MotionDataset,
        Text2MotionDataset)
    from motiondiffusion_moe_tpu.training import CheckpointManager, Trainer

    run_dir = os.path.join(cfg.checkpoint_dir, cfg.name)
    os.makedirs(run_dir, exist_ok=True)
    if is_primary():
        cfg.save(os.path.join(run_dir, "config.json"))
        print(f"[train] config -> {run_dir}/config.json")
        print(f"[train] devices: {jax.devices()}")
        if jax.process_count() > 1:
            print(f"[train] multi-host: {jax.process_count()} processes, "
                  f"{len(jax.local_devices())} local devices each")

    if args.dataset == "synthetic":
        dataset = SyntheticText2MotionDataset(cfg.data,
                                              size=args.synthetic_size,
                                              seed=cfg.train.seed)
    else:
        dataset = Text2MotionDataset(cfg.data, split="train",
                                     seed=cfg.train.seed)
    # every run dir is self-contained: evaluate/visualize read meta/ for
    # denormalization (and fall back to identity stats when absent)
    if is_primary():
        dataset.normalizer.save(os.path.join(run_dir, "meta"))

    # Each process loads ITS shard of every epoch (the reference's
    # per-rank DistributedSampler, tools/train.py:159-164) at the LOCAL
    # batch size; parallel.shard_batch assembles the global [batch_size]
    # arrays from the per-process rows.
    nproc = jax.process_count()
    sampler = DistributedSampler(
        len(dataset), num_replicas=nproc, rank=jax.process_index(),
        seed=cfg.train.seed)
    loader = DataLoader(dataset,
                        batch_size=local_batch_slice(cfg.train.batch_size),
                        sampler=sampler, seed=cfg.train.seed)
    norm = dataset.normalizer
    trainer = Trainer(cfg, normalizer_stats=(norm.mean, norm.std))
    state = trainer.init_state()
    ckpt = CheckpointManager(os.path.join(run_dir, "ckpt"))
    trainer.fit(state, loader, checkpoints=ckpt)
    ckpt.close()
    if is_primary():
        print("[train] done")


if __name__ == "__main__":
    main()
