"""Test env: force an 8-device virtual CPU mesh before any JAX computation.

Note: on this machine the `axon` TPU plugin overrides the JAX_PLATFORMS env
var, so the platform must be forced via jax.config (verified: env-var alone
still selects the TPU)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
