"""Test configuration: run everything on a virtual 8-device CPU mesh.

Correctness tests never need real TPU hardware; multi-chip sharding tests use
the forced host-platform device count, exactly as the driver's
dryrun_multichip does.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (one tunneled
# TPU chip); unit tests must not contend for it and need N virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon PJRT plugin PREPENDS itself to jax_platforms regardless of the
# env var (resolved config becomes "axon,cpu" and jax.devices() returns the
# TPU). Override at the config level, which the plugin cannot touch.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persist XLA compiles across test runs (compiles are very slow on this box).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache_cpu")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
