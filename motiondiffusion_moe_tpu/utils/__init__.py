from motiondiffusion_moe_tpu.utils.logging import MetricsLogger, print_current_loss  # noqa: F401
