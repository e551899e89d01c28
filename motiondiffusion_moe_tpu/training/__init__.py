from motiondiffusion_moe_tpu.training.losses import (  # noqa: F401
    masked_frame_mse,
    velocity_loss,
    acceleration_loss,
    structure_loss,
    progressive_loss,
)
from motiondiffusion_moe_tpu.training.train_state import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
    select_params,
)
from motiondiffusion_moe_tpu.training.trainer import Trainer  # noqa: F401
from motiondiffusion_moe_tpu.training.checkpoint import CheckpointManager  # noqa: F401
