"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding tests exercise a real Mesh without TPU hardware (the driver
dry-runs the TPU path separately via __graft_entry__.dryrun_multichip).

NOTE: this environment's axon TPU plugin initializes JAX config at
interpreter start (sitecustomize), so JAX_PLATFORMS in os.environ is
ignored — the platform must be forced via jax.config.update.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persist compiled executables across test processes.
_CACHE = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
