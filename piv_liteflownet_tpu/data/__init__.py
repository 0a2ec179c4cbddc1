from piv_liteflownet_tpu.data.datasets import (  # noqa: F401
    Run,
    InferenceRun,
    InferenceEval,
    PIVData,
    PIVH5,
    PIVLMDB,
    get_transform,
)
from piv_liteflownet_tpu.data.loader import BatchLoader, PrefetchLoader  # noqa: F401
