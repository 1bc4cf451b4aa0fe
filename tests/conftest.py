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

# Share one persistent XLA compilation cache across the suite (incl. the
# train.py subprocesses of the e2e tests, which inherit the env var):
# the scripted sweeps re-compile identical tiny-ViT programs dozens of
# times, which dominates suite wall time on small hosts.
_cache_dir = os.path.expanduser("~/.cache/clip_calibration_tpu/xla")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache_dir)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
