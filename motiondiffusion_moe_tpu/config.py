"""Single-source-of-truth configuration.

The reference splits configuration truth between argparse defaults
(``text2motion/options/train_options.py:7-25``), call-site hardcodes
(``text2motion/tools/train.py:58-70``: ff_size=256, num_heads=4,
text_latent_dim=128, moe_num_experts=4, model_size="small") and a README
table that matches neither. Here one frozen dataclass hierarchy is the only
truth; it serializes to JSON next to every checkpoint and round-trips for
eval/vis (replacing the reference's ``opt.txt`` dump/re-parse,
``options/base_options.py:77-87`` / ``utils/get_opt.py:30-92``).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


@dataclass(frozen=True)
class DataConfig:
    """Dataset constants. Mirrors ``tools/train.py:113-130`` (t2m/kit)."""

    dataset_name: str = "t2m"          # "t2m" (HumanML3D) or "kit"
    data_root: str = "./data/HumanML3D"
    dim_pose: int = 263                # 251 for kit
    num_joints: int = 22               # 21 for kit
    max_motion_length: int = 196       # fixed model sequence length
    min_motion_length: int = 40        # filter: 40 <= len < 200 (t2m); 24 for kit
    unit_length: int = 4               # temporal downsample unit (eval snapping)
    feat_bias: float = 25.0            # root-vel/foot-contact std divisor (dataset1.py:82-104)
    times: int = 1                     # dataset duplication multiplier (dataset1.py:118-119)
    max_text_len: int = 20             # GloVe token cap for the eval pathway
    use_native_io: bool = True         # C++ batch assembly (native/motionio.cc); falls back to Python

    @staticmethod
    def humanml3d(**kw: Any) -> "DataConfig":
        return DataConfig(dataset_name="t2m", dim_pose=263, num_joints=22,
                          min_motion_length=40, **kw)

    @staticmethod
    def kit(**kw: Any) -> "DataConfig":
        kw.setdefault("data_root", "./data/KIT-ML")
        return DataConfig(dataset_name="kit", dim_pose=251, num_joints=21,
                          min_motion_length=24, **kw)


@dataclass(frozen=True)
class DiffusionConfig:
    """Diffusion process. Mirrors ``models/gaussian_diffusion.py`` +
    ``trainers/ddpm_trainer.py:43-51`` (the live config: eps-pred, FIXED_SMALL, MSE)."""

    num_timesteps: int = 1000
    beta_schedule: str = "linear"      # linear | cosine | sqrt
    model_mean_type: str = "epsilon"   # epsilon | start_x | previous_x
    model_var_type: str = "fixed_small"  # fixed_small | fixed_large | learned | learned_range
    loss_type: str = "mse"             # mse | rescaled_mse | kl | rescaled_kl
    schedule_sampler: str = "uniform"  # uniform | loss-second-moment | adaptive
    cfg_scale: float = 7.5             # trainers/ddpm_trainer.py:61
    clip_denoised: bool = False        # trainer passes clip_denoised=False (:163)


@dataclass(frozen=True)
class ModelConfig:
    """Denoiser + text-encoder architecture. Mirrors
    ``models/transformer.py:174-257`` with the call-site hardcodes of
    ``tools/train.py:58-70`` as defaults."""

    input_feats: int = 263
    max_frames: int = 196
    latent_dim: int = 512
    ff_size: int = 256                 # expert hidden size (tools/train.py:63)
    num_layers: int = 8                # per U-Net scale
    num_heads: int = 4
    dropout: float = 0.1
    activation: str = "gelu"
    # --- MoE (models/switch_moe.py) ---
    use_moe: bool = True
    num_experts: int = 4               # tools/train.py:67
    moe_top_k: int = 2
    moe_capacity_factor: float = 2.0   # static-shape dispatch headroom (TPU requirement)
    moe_aux_loss_weight: float = 0.01
    moe_num_branches: int = 2          # MoEMultiBranchFFN branches (multi_branch.py:31-61)
    # "dense_fused" (fastest, single-device), "dense" (einsum form the SPMD
    # partitioner shards over the 'expert' axis), "dispatch" (capacity
    # dispatch/combine, the explicit all-to-all layout)
    moe_compute: str = "dense_fused"
    # --- attention (models/fast_attention.py) ---
    # Performer FAVOR+ feature count. The reference passes num_features=256
    # (fast_attention.py:6,117) but its reduced-QR orthogonalization silently
    # truncates the projection to head_dim=128 rows; 128 is therefore the
    # reference's EFFECTIVE count and the parity default here.
    num_random_features: int = 128
    xattn_chunk_size: int = 256        # MemoryEfficientCrossAttention chunk (tools/train.py:70)
    # fused fast-layout exact-xattn kernel (ops/flash_attention.py) — off by
    # default: measured -0.4% at N=77 text keys; for long-context text only
    use_fast_xattn: bool = False
    # --- stochastic depth (models/time.py:35-48, transformer.py:227) ---
    stochastic_depth_min: float = 0.8  # survival probs linspace(1.0 -> 0.8)
    # --- text encoder (models/text_encoder.py) ---
    text_encoder: str = "hash"         # "deberta-v3-large" | "deberta-tiny" | "hash"
    # local HF checkpoint (dir with pytorch_model.bin, or a .bin/.pt file)
    # grafted into the text encoder at train init; "" = random init (warned)
    text_encoder_ckpt: str = ""
    text_latent_dim: int = 128         # tools/train.py:65
    text_num_prompt_tokens: int = 8    # learned prompt tokens (text_encoder.py:19-22)
    text_max_tokens: int = 77          # tokenizer max_length (text_encoder.py:25-28)
    time_embed_mult: int = 4           # time_embed_dim = latent_dim * 4 (transformer.py:203)
    dtype: str = "bfloat16"            # compute dtype; params stay float32
    # Rematerialization policy for the decoder blocks (training-time
    # HBM-traffic / FLOPs trade; no effect on sampling math):
    #   ""            - store all intermediates (XLA default)
    #   "dots"        - jax.checkpoint with dots_saveable: keep matmul
    #                   outputs, recompute elementwise/LN chains in the
    #                   backward
    #   "dots_named"  - dots_saveable + saved Pallas attention outputs
    #                   (avoids re-running the favor forward kernels in
    #                   the backward pass)
    #   "all"         - full recompute (minimum memory)
    remat_blocks: str = ""
    # Run each U-Net scale's decoder blocks as ONE nn.scan over a stacked
    # [L, ...] parameter layout instead of L separately-traced modules.
    # Same math (parity-tested); the traced program shrinks ~Lx, cutting
    # XLA compile time, and the stacked layout is what layer-sharded
    # schemes (pipeline staging) partition. Checkpoints convert between
    # layouts with models.transformer.stack_block_params /
    # unstack_block_params. TRAINING the flagship in this layout needs
    # remat_blocks="dots": the stacked per-block activation buffer
    # otherwise OOMs a 16 GiB chip (17.11 GiB needed); with dots it fits
    # at 118 ms/step vs the named layout's 84 ms (chip-measured,
    # BENCH_NOTES.md round-5 scanned-train section).
    scan_blocks: bool = False
    # GPipe microbatches per pipelined forward (0 = auto: 2x the 'pipe'
    # degree). Only read when the mesh has a 'pipe' axis > 1; the batch
    # must divide into this many microbatches.
    pipeline_microbatches: int = 0


@dataclass(frozen=True)
class ParallelConfig:
    """Device-mesh layout. The reference is DP-only over NCCL
    (``tools/train.py:95-100``); here a single Mesh carries data and expert
    axes, with MoE all-to-all over the expert axis (ICI). Axis NAMES are
    fixed framework-wide constants (``parallel.mesh.DATA_AXIS`` etc.) —
    only the partition counts are configurable."""

    num_expert_partitions: int = 1     # experts sharded over this many devices
    num_model_partitions: int = 1      # tensor parallelism (FFN column/row split)
    # sequence/context parallelism: activations sharded on the frame axis T,
    # Performer kv moments all-reduced by XLA; no parameter is sharded.
    # Routes attention through its SPMD-partitionable pure-JAX path (the
    # Pallas kernels are single-device programs). Pick a value dividing
    # max_frames AND max_frames//2 (196 -> 2) for even shards.
    num_seq_partitions: int = 1
    # pipeline parallelism: GPipe stages over the stacked decoder-block
    # layer axis (requires model.scan_blocks; composes with DP only —
    # parallel/pipeline_parallel.py)
    num_pipeline_stages: int = 1
    # data-axis size: 0 = auto (all visible accelerator devices / EP; stays
    # single-device on the CPU backend so unit tests don't silently shard),
    # 1 = force unsharded, N>1 = force an N-way data axis.
    num_data_partitions: int = 0
    # ZeRO-1: shard the Adam moments and the EMA weights over the data
    # axis (each data-parallel device stores and updates 1/dp of the
    # optimizer state; GSPMD lowers the gradient all-reduce into
    # reduce-scatter + sharded update + update all-gather). Params stay
    # data-replicated, so forward/backward programs are unchanged.
    zero1: bool = False
    fsdp_axis: Optional[str] = None    # reserved (model is small)


@dataclass(frozen=True)
class TrainConfig:
    """Optimization. Mirrors ``trainers/ddpm_trainer.py`` + train_options.py."""

    batch_size: int = 32               # global batch (train_options.py:15)
    num_epochs: int = 50               # train_options.py:13
    lr: float = 2e-4                   # train_options.py:14
    grad_clip_norm: float = 1.0        # ddpm_trainer.py:241
    seed: int = 0
    # Reference runs a second unconditional forward+update per batch
    # (ddpm_trainer.py:319-333). `uncond_step` reproduces that; the
    # recommended alternative is classic caption dropout.
    uncond_step: bool = True
    caption_dropout: float = 0.0
    # K optimizer steps per compiled call (lax.scan inner loop): amortizes
    # the fixed per-dispatch host/control-plane cost. 1 = step-per-call
    # (the reference's Python-loop cadence).
    steps_per_call: int = 1
    # Gradient accumulation: split each optimizer batch into this many
    # sequential microbatches (lax.scan) and average their grads before
    # the single update — activation memory drops ~A-fold at the same
    # optimizer batch, enabling batch sizes past HBM. batch_size must be
    # divisible by it. Each microbatch normalizes its own loss (mask sum,
    # MoE aux), so the accumulated gradient is the mean of microbatch
    # gradients — exactly the reference's DDP semantics across ranks
    # (per-rank loss + all-reduce mean, tools/train.py:140-145), which
    # differs from the single-batch global-mask-sum loss only for ragged
    # lengths. 1 = off.
    grad_accum_steps: int = 1
    # PRNG impl for the TRAINING rng stream (dropout masks, noise draws).
    # "rbg" uses the TPU's native RngBitGenerator: measured 168 -> 91 ms
    # per flagship train step vs threefry (~250 dropout sites each paying
    # a threefry chain). "threefry" restores jax's default
    # partition-invariant streams (bit-identical across mesh layouts).
    rng_impl: str = "rbg"

    @property
    def jax_rng_impl(self) -> str:
        """``rng_impl`` as a jax PRNG impl name ("threefry" is accepted
        as an alias for jax's "threefry2x32")."""
        return {"threefry": "threefry2x32"}.get(self.rng_impl,
                                                self.rng_impl)

    # Adam moment dtypes ("float32" | "bfloat16"): bf16 halves that
    # moment's read+write HBM traffic in the (bandwidth-bound, measured
    # at the f32 roofline) optimizer update. nu is stored rounded but
    # accumulated in f32; sqrt halves its relative rounding error in the
    # denominator (~0.2%).
    adam_mu_dtype: str = "float32"
    adam_nu_dtype: str = "float32"
    log_every: int = 50                # train_options.py
    save_latest_every: int = 500       # train_options.py:25
    save_every_epochs: int = 5         # ddpm_trainer.py:350-362
    # Exponential moving average of the weights (0 = off, e.g. 0.9999).
    # The reference keeps none (trainers/ddpm_trainer.py optimizes raw
    # weights only); standard diffusion practice (guided-diffusion, MDM)
    # samples from the EMA weights. Stored in TrainState.ema_params,
    # checkpointed, selected at sampling time via --use_ema.
    ema_decay: float = 0.0
    # Learning-rate schedule: "constant" (the reference's fixed Adam lr,
    # train_options.py:14) or "cosine" (warmup + cosine decay to 0 over
    # lr_decay_steps TOTAL steps). lr_warmup_steps linearly ramps 0 -> lr
    # under either schedule.
    lr_schedule: str = "constant"
    lr_warmup_steps: int = 0
    lr_decay_steps: int = 0
    # Optional "advanced" losses from the reference README (README.md:24-31,
    # 97-129) that its code never implements — implemented for real here.
    w_velocity: float = 0.0            # temporal-coherence (velocity MSE)
    w_acceleration: float = 0.0        # physics-prior (acceleration/jerk)
    w_structure: float = 0.0           # bone-length consistency in joint space
    w_progressive: float = 0.0         # multi-scale (downsampled) denoising MSE


@dataclass(frozen=True)
class ExperimentConfig:
    name: str = "t2m_moe_small"
    checkpoint_dir: str = "./checkpoints"
    data: DataConfig = field(default_factory=DataConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)

    # ---------------- serialization round-trip ----------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, **kw: Any) -> str:
        return json.dumps(self.to_dict(), indent=2, **kw)

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "ExperimentConfig":
        def build(cls, section):
            # tolerate unknown keys so config.json round-trips across
            # framework versions (fields added or retired — e.g. the old
            # fixed axis-name strings) instead of crashing the load
            names = {f.name for f in dataclasses.fields(cls)}
            known = {k: v for k, v in section.items() if k in names}
            dropped = sorted(set(section) - names)
            if dropped:
                print(f"[config] note: ignoring unknown "
                      f"{cls.__name__} keys {dropped}")
            return cls(**known)

        return ExperimentConfig(
            name=d.get("name", "exp"),
            checkpoint_dir=d.get("checkpoint_dir", "./checkpoints"),
            data=build(DataConfig, d.get("data", {})),
            diffusion=build(DiffusionConfig, d.get("diffusion", {})),
            model=build(ModelConfig, d.get("model", {})),
            parallel=build(ParallelConfig, d.get("parallel", {})),
            train=build(TrainConfig, d.get("train", {})),
        )

    @staticmethod
    def from_json(s: str) -> "ExperimentConfig":
        return ExperimentConfig.from_dict(json.loads(s))

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            f.write(self.to_json())

    @staticmethod
    def load(path: str) -> "ExperimentConfig":
        with open(path) as f:
            return ExperimentConfig.from_json(f.read())

    # Convenience presets ------------------------------------------------
    @staticmethod
    def small_dense() -> "ExperimentConfig":
        """BASELINE.json config #1: dense (no-MoE) small transformer."""
        return ExperimentConfig(
            name="t2m_dense_small",
            model=ModelConfig(use_moe=False, num_layers=4, latent_dim=256,
                              ff_size=512, text_latent_dim=128),
        )

    @staticmethod
    def moe_small() -> "ExperimentConfig":
        """The reference's live config (tools/train.py:58-70)."""
        return ExperimentConfig(name="t2m_moe_small")

    @staticmethod
    def moe_big() -> "ExperimentConfig":
        """README's 'big' config: experts=16, expert-sharded."""
        return ExperimentConfig(
            name="t2m_moe_big",
            model=ModelConfig(latent_dim=768, ff_size=1024, num_layers=12,
                              num_heads=8, num_experts=16),
            parallel=ParallelConfig(num_expert_partitions=8),
        )
