"""Test configuration: force CPU with an 8-device virtual mesh.

The image's sitecustomize pre-imports jax and registers the axon TPU
plugin in every Python process, so JAX_PLATFORMS env tweaks are too late.
``jax.config.update`` still works before the first backend use — force
CPU (fast for tiny shapes, enables the 8-device fake mesh) and turn on
the persistent compilation cache (compiles dominate test time on this
2-vCPU box).
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
