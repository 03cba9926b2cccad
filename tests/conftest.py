"""Test configuration: force an 8-virtual-device CPU JAX platform.

Must run before jax is imported anywhere: the environment's axon TPU plugin
(sitecustomize in PYTHONPATH) registers itself at interpreter start driven by
PALLAS_AXON_POOL_IPS/JAX_PLATFORMS; tests instead emulate an 8-device mesh on
CPU (SURVEY.md SS4 distributed-test strategy).  Run pytest from a clean shell:
the conftest re-execs nothing — it relies on these env vars being applied
before the first jax import, which pytest guarantees since conftest is
imported before test modules.
"""

import os
import sys

# SURFACENET_TPU_TESTS=1 leaves the platform alone so tests/test_tpu_only.py
# can run compiled on real hardware:
#   SURFACENET_TPU_TESTS=1 python -m pytest tests/test_tpu_only.py
# (the rest of the suite skips itself on non-8-device meshes as needed).
_ON_TPU = os.environ.get("SURFACENET_TPU_TESTS") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _ON_TPU:
    # The axon sitecustomize may have already set the platform config;
    # override explicitly (works as long as no backend is initialized yet).
    jax.config.update("jax_platforms", "cpu")

    if jax.devices()[0].platform != "cpu" or len(jax.devices()) != 8:
        raise RuntimeError(
            f"expected 8 CPU devices for tests, got {jax.devices()}; a JAX "
            "backend was initialized before tests/conftest.py ran"
        )

import numpy as np
import pytest


@pytest.fixture(scope="session")
def sphere_scene():
    """Shared synthetic golden scene (8 views, analytic sphere)."""
    from surfacenet_tpu.data.synthetic import make_sphere_scene

    return make_sphere_scene(n_views=8, hw=(120, 160))


@pytest.fixture(scope="session")
def small_scene():
    """Cheaper 4-view scene for unit tests."""
    from surfacenet_tpu.data.synthetic import make_sphere_scene

    return make_sphere_scene(n_views=4, hw=(90, 120))
