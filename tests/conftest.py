"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The environment's sitecustomize registers a remote TPU backend and
forces jax_platforms via jax.config (which beats the JAX_PLATFORMS env
var), so tests must override through jax.config as well — before any
backend is touched.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
