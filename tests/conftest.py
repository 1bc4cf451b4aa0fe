"""Test configuration: force a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere, so this lives at the top
of conftest. Multi-chip sharding tests run against the virtual CPU mesh
(standard JAX practice — no pod needed); the real TPU is exercised by
bench.py and the driver's compile checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (TPU)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; force CPU via config too.
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
