"""Shim: chained-executable timing now lives in the package."""

import sys

sys.path.insert(0, "/root/repo")

from piv_liteflownet_tpu.utils.benchmark import chained_time, make_chained  # noqa: F401
