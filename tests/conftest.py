"""Test harness: run JAX on a virtual 8-device CPU mesh.

The axon TPU plugin ignores the JAX_PLATFORMS environment variable, so we
must force the CPU platform through jax.config before any computation, and
the host-device-count flag must be in XLA_FLAGS before jax is imported.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
