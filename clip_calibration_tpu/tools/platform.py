"""Host-platform forcing helpers (the axon TPU plugin quirk).

The axon TPU plugin IGNORES the ``JAX_PLATFORMS`` env var, so honoring a
requested CPU platform requires ``jax.config.update("jax_platforms",
"cpu")`` before first device use. The virtual multi-device CPU backend
additionally needs ``--xla_force_host_platform_device_count=N`` in
``XLA_FLAGS`` before the CPU client initializes. This module is the single
home for both workarounds — used by ``train.py``, ``tests/conftest.py``
and ``__graft_entry__.py``.
"""

from __future__ import annotations

import os
import re

_COUNT_FLAG = "--xla_force_host_platform_device_count"


def cpu_platform_requested() -> bool:
    """True when the environment asks for the CPU platform."""
    return os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu"


def ensure_virtual_device_flag(n_devices: int) -> None:
    """Guarantee XLA_FLAGS requests >= n_devices virtual CPU devices.

    The last occurrence of the flag wins in XLA's parser, so appending
    raises a preset smaller count. Only effective if the CPU client has
    not initialized yet. Harmless when the TPU backend is used (the flag
    only affects the CPU backend).
    """
    flags = os.environ.get("XLA_FLAGS", "")
    m = re.search(_COUNT_FLAG + r"=(\d+)", flags)
    if m is None or int(m.group(1)) < n_devices:
        os.environ["XLA_FLAGS"] = (
            flags + f" {_COUNT_FLAG}={n_devices}").strip()


def force_cpu_platform(n_devices: int | None = None):
    """Force jax onto the CPU platform; returns the jax module.

    Sets the env var too so spawned subprocesses inherit the request
    (they still need this function — or train.py's equivalent check —
    to honor it).
    """
    if n_devices is not None:
        ensure_virtual_device_flag(n_devices)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    return jax


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache (first TPU compile is 20-40s;
    sweep scripts run hundreds of short processes that would each
    re-pay it). Env vars win so a parent process (e.g. the test
    suite's conftest) can point every spawned run at one shared cache.
    Shared by train.py, the serving CLI and bench.py."""
    try:
        import jax
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.expanduser("~/.cache/clip_calibration_tpu/xla")))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            float(os.environ.get(
                "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", 1)))
    except Exception as e:  # older jax without the knobs
        print(f"compilation cache unavailable: {e}")
