from motiondiffusion_moe_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    SEQ_AXIS,
    PIPE_AXIS,
    EXPERT_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_spec,
    param_shardings,
    shard_batch,
    make_sharded_train_step,
)
from motiondiffusion_moe_tpu.parallel.moe_parallel import (  # noqa: F401
    ep_moe_ffn,
    make_ep_moe_layer,
)
from motiondiffusion_moe_tpu.parallel.pipeline_parallel import (  # noqa: F401
    gpipe,
    make_block_stage_fn,
)
from motiondiffusion_moe_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    is_primary,
    local_batch_slice,
)
