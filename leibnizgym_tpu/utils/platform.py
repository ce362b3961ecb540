"""Platform selection helper.

Some TPU plugin environments (e.g. the axon PJRT plugin) register themselves
via sitecustomize and take priority regardless of the JAX_PLATFORMS env var.
The jax config update wins over plugin registration, so scripts call this
first to honor an explicit user/driver platform request.
"""

from __future__ import annotations

import os


def ensure_requested_platform():
    """If JAX_PLATFORMS is set, enforce it via jax.config (must run before
    any computation creates the backend)."""
    requested = os.environ.get("JAX_PLATFORMS", "")
    if requested:
        import jax

        try:
            jax.config.update("jax_platforms", requested)
        except Exception:
            pass  # backend already initialized; keep whatever exists
