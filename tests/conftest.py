"""Unit tests run on CPU with 8 virtual devices (multi-chip logic is
validated without TPU hardware; the real chip is reserved for bench.py).

NOTE: this environment pre-sets JAX_PLATFORMS=axon and the axon plugin
overrides env-based platform selection, so the CPU backend must be forced
via jax.config.update before any backend initialization."""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
