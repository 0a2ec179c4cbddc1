from piv_liteflownet_tpu.models.liteflownet import (  # noqa: F401
    ModelConfig,
    init_params,
    forward,
    param_shapes,
)
from piv_liteflownet_tpu.models.factory import hui_liteflownet, piv_liteflownet, Model  # noqa: F401
