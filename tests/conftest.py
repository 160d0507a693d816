"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated
on forced host devices (the pattern the driver's dryrun uses too).
Must set env vars before jax initializes.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The axon sitecustomize pins jax_platforms to the tunneled TPU; tests
# want the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: recompiles across test runs are the
# dominant cost on CPU.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
