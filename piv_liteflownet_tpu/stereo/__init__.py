from piv_liteflownet_tpu.stereo.vel3d import willert  # noqa: F401
from piv_liteflownet_tpu.stereo.dewarp import nl_trans, warp_image, grid_regularize, map_coeff  # noqa: F401
from piv_liteflownet_tpu.stereo.matching import (  # noqa: F401
    gen_template,
    template_matching,
    find_local_max,
)
