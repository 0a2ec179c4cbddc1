from piv_liteflownet_tpu.utils.flow_io import (  # noqa: F401
    read_flow,
    write_flow,
    read_flow_collection,
    flowname_modifier,
    resize_flow,
    horizontal_flip_flow,
    vertical_flip_flow,
)
from piv_liteflownet_tpu.utils.timer import TimerBlock, IteratorTimer  # noqa: F401
