"""Test harness config: force an 8-virtual-device CPU platform.

Multi-chip sharding tests run on a virtual CPU mesh (no TPU pod is
available in CI); the driver separately dry-runs the multi-chip path.
Must run before any jax backend initialization.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: no persistent compile cache — this environment compiles through a
# remote service whose CPU AOT machine flags differ from the local host
# (cpu_aot_loader warns about SIGILL risk when reloading such artifacts).
