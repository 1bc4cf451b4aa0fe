"""Test configuration: force a virtual 8-device CPU mesh.

Must set env vars BEFORE jax is imported anywhere, so this lives at the top
of conftest. Multi-chip sharding tests run against the virtual CPU mesh
(standard JAX practice — no pod needed); the real TPU is exercised by
bench.py and the driver's compile checks.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force the CPU platform + 8 virtual devices (the axon TPU plugin ignores
# JAX_PLATFORMS, and the shell presets it; see tools/platform.py).
from clip_calibration_tpu.tools.platform import force_cpu_platform  # noqa: E402

jax = force_cpu_platform(n_devices=8)

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


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-preset / long-running tests (deselect with "
        "-m 'not slow')")


@pytest.fixture(scope="session")
def rng():
    import numpy as np
    return np.random.default_rng(0)
