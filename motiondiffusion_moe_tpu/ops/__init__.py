from motiondiffusion_moe_tpu.ops.performer_pallas import (  # noqa: F401
    favor_attention,
    favor_attention_reference,
)
from motiondiffusion_moe_tpu.ops.flash_attention import (  # noqa: F401
    flash_cross_attention,
    cross_attention_reference,
)
