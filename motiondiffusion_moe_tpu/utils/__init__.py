from motiondiffusion_moe_tpu.utils.logging import MetricsLogger, print_current_loss  # noqa: F401
from motiondiffusion_moe_tpu.utils.profiling import StepTimer, annotate, trace  # noqa: F401
from motiondiffusion_moe_tpu.utils.debugging import (  # noqa: F401
    assert_finite_tree,
    check_finite,
    checked,
    enable_nan_debugging,
)
from motiondiffusion_moe_tpu.utils.media import (  # noqa: F401
    compose_gif_img_list,
    compose_image,
    compose_and_save_img,
    save_images,
    list_cut_average,
)
from motiondiffusion_moe_tpu.utils.cache import enable_compilation_cache  # noqa: F401
