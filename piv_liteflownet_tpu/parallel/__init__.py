from piv_liteflownet_tpu.parallel.mesh import make_mesh, data_sharding, replicated  # noqa: F401
from piv_liteflownet_tpu.parallel.train_step import make_train_step, TrainState  # noqa: F401
