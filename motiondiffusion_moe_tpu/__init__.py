"""TPU-native text-to-motion diffusion framework.

A brand-new JAX / XLA / Pallas / pjit framework with the capabilities of
``ltdoanh2004/MotionDiffusion-MoE`` (see SURVEY.md): a MoE diffusion
transformer for text-to-motion generation on HumanML3D / KIT-ML features,
designed TPU-first — SPMD over a device mesh, ``lax.scan`` samplers, fused
Pallas kernels for the hot attention/MoE paths, and on-device motion-feature
processing.
"""

__version__ = "0.1.0"

from motiondiffusion_moe_tpu.config import (  # noqa: F401
    DataConfig,
    DiffusionConfig,
    ModelConfig,
    TrainConfig,
    ExperimentConfig,
)
