"""Test configuration: run on CPU with 8 virtual devices.

Matches the driver's multi-chip dry-run environment
(xla_force_host_platform_device_count) so sharding tests exercise real SPMD
partitioning without TPU hardware. Note: the environment's axon TPU plugin
overrides the JAX_PLATFORMS env var, so we must force the platform through
jax.config *before* backend initialization.
"""
import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
