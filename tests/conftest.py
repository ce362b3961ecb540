"""Test configuration: force CPU backend with an 8-device virtual mesh.

The axon TPU plugin overrides JAX_PLATFORMS via sitecustomize, so the config
update (which wins over the env) is required, not just the env var.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
