from motiondiffusion_moe_tpu.models.embeddings import (  # noqa: F401
    TimestepEmbedding,
    GatedFusion,
    StylizationBlock,
    grad_clamp,
)
from motiondiffusion_moe_tpu.models.attention import (  # noqa: F401
    FastAttention,
    PerformerSelfAttention,
    DualSelfAttentionBlock,
    LinearTemporalCrossAttention,
    GatedCrossAttention,
    CrossAttentionBlock,
)
from motiondiffusion_moe_tpu.models.moe import (  # noqa: F401
    SwitchMoELayer,
    MoEMultiBranchFFN,
    DenseFFN,
)
from motiondiffusion_moe_tpu.models.transformer import (  # noqa: F401
    MoEDecoderLayer,
    MotionTransformer,
    stack_block_params,
    unstack_block_params,
)
from motiondiffusion_moe_tpu.models.text_encoder import (  # noqa: F401
    HashTextEncoder,
    TextEncoding,
    get_text_encoder,
)
