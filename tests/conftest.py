"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
(mesh/pjit/shard_map paths) can be exercised without TPU pods, mirroring the
strategy recommended in SURVEY.md §4. float64 is enabled so golden-value
comparisons against scipy references hold at rtol<=1e-6.

Note: the ambient environment registers a TPU PJRT plugin via sitecustomize
and pins JAX_PLATFORMS before any conftest runs, so the platform must be
overridden through jax.config (valid until the first backend is initialized)
rather than os.environ.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache shared by all xdist workers and across
# runs: much of the suite's wall time is CPU compiles of jitted kernels;
# a warm cache cuts the full suite from ~23-25 min to 15:02 (measured,
# 310 tests, -n 4 on a 1-core runner). The directory is gitignored; safe
# under concurrent writers (atomic renames). CPU AOT results are
# host-microarchitecture-specific, so the default directory is keyed by
# the host's CPU feature set — a checkout shared across machines (network
# volume, container image, migrated VM) must not reuse another host's
# cache (XLA warns of possible SIGILL).
def _machine_key():
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            feats = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        feats = platform.processor()
    raw = (platform.machine() + feats).encode()
    return hashlib.sha1(raw).hexdigest()[:12]


_cache_dir = os.environ.get(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(__file__), os.pardir, ".jax_cache", _machine_key()
    ),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
