"""Test harness: force an 8-device virtual CPU platform so sharding tests run
without a TPU pod.

NOTE: under the axon TPU tunnel the JAX_PLATFORMS env var is ignored unless
present at interpreter launch; `jax.config.update('jax_platforms', ...)`
works at any point before backend init, so we use that (and set XLA_FLAGS
before the first jax.devices() call).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# persistent compilation cache: render-chunk compiles dominate test time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
