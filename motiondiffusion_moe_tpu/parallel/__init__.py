from motiondiffusion_moe_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_spec,
    param_shardings,
    shard_batch,
    make_sharded_train_step,
)
