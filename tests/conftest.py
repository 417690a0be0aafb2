"""Test configuration: run all tests on a virtual 8-device CPU platform so
multi-shard paths are exercised without TPU hardware (benches use the real
chip via bench.py instead).

Note: the environment may pre-register an accelerator PJRT plugin via
sitecustomize and set JAX_PLATFORMS; forcing the platform through
jax.config (before first backend use) is what reliably selects CPU.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite rebuilds near-identical GMG
# stacks in many test files; caching compiled executables across tests and
# runs cuts total wall time several-fold.
jax.config.update("jax_compilation_cache_dir", "/tmp/hyteg_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
