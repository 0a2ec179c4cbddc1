from piv_liteflownet_tpu.ops.nn import (  # noqa: F401
    conv2d,
    depthwise_deconv4x2,
    leaky_relu,
    torch_conv_init,
)
from piv_liteflownet_tpu.ops.correlation import correlation  # noqa: F401
from piv_liteflownet_tpu.ops.warp import backwarp  # noqa: F401
from piv_liteflownet_tpu.ops.resize import resize_bilinear, avg_pool  # noqa: F401
