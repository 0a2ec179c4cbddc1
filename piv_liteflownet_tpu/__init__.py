"""piv_liteflownet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) PIV optical-flow framework.

A from-scratch rebuild of the capabilities of ``abrosua/piv_liteflownet-pytorch``
(reference mounted read-only at /root/reference), redesigned TPU-first:

- NHWC layouts, functional param pytrees, one jitted forward for the whole
  coarse-to-fine pyramid (the level loop unrolls at trace time).
- The reference's CuPy CUDA cost-volume kernel (reference
  ``src/correlation.py:9-234``) becomes an XLA shift-stack formulation plus a
  Pallas TPU kernel for the hot path.
- ``grid_sample``-style backward warping (reference ``src/models.py:20-35``)
  becomes a vectorized bilinear gather.
- Multi-device scaling via ``jax.sharding.Mesh`` + XLA collectives instead of
  ``nn.parallel.DataParallel`` (reference ``trainer.py:375``).
"""

__version__ = "0.1.0"

from piv_liteflownet_tpu.models.factory import hui_liteflownet, piv_liteflownet  # noqa: F401
