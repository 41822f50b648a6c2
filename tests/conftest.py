"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated against XLA's CPU backend with 8 virtual devices, exactly how the
driver's ``dryrun_multichip`` validates the multi-chip path.

NOTE: this environment injects a sitecustomize that registers the ``axon``
real-TPU backend and pins ``JAX_PLATFORMS=axon`` before any conftest runs —
setting the env var here is too late. ``jax.config.update`` still wins as
long as no backend has been initialized, so that is the mechanism used.
"""

import os
import sys

import pytest

# TPU lane (VERDICT r2 #3): ``AD_MPC_TPU_TESTS=1 pytest -m tpu`` keeps the
# real accelerator backend and runs ONLY the tpu-marked tests, which compile
# the Pallas kernels with interpret=False — the one place the Mosaic
# lowering path (the round-2 atan2 crash class) is exercised by the suite.
TPU_LANE = os.environ.get("AD_MPC_TPU_TESTS") == "1"

flags = os.environ.get("XLA_FLAGS", "")
if not TPU_LANE and "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: repeated test sessions skip XLA re-compiles.
_cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_collection_modifyitems(config, items):
    if TPU_LANE:
        skip = pytest.mark.skip(
            reason="TPU lane runs only tpu-marked tests (8-device CPU mesh "
            "and x64 are unavailable)"
        )
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="needs a real TPU: run AD_MPC_TPU_TESTS=1 pytest -m tpu"
        )
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)
