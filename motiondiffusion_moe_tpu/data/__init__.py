from motiondiffusion_moe_tpu.data.normalizer import MotionNormalizer  # noqa: F401
from motiondiffusion_moe_tpu.data.dataset import (  # noqa: F401
    Text2MotionDataset,
    SyntheticText2MotionDataset,
    parse_text_annotation,
)
from motiondiffusion_moe_tpu.data.loader import (  # noqa: F401
    DistributedSampler,
    DataLoader,
)
