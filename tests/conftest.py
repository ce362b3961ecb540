"""Test configuration: force CPU backend with an 8-device virtual mesh.

The axon TPU plugin overrides JAX_PLATFORMS via sitecustomize, so the config
update (which wins over the env) is required, not just the env var.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables between test modules.

    The full 160-test suite accumulates hundreds of compiled XLA CPU
    executables in one process; past ~90 tests the next big compile aborts
    inside XLA (observed twice, reproducibly, at the same test — a subset
    run of the same tests passes). Clearing per module caps the live
    executable count; module-scoped fixtures survive (their jitted
    functions just recompile)."""
    yield
    jax.clear_caches()
