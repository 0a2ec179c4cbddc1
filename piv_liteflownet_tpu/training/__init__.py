from piv_liteflownet_tpu.training.loss import (  # noqa: F401
    EPE,
    L1Loss,
    L2Loss,
    MultiScale,
    LevelLoss,
    hui_loss,
    piv_loss,
)
