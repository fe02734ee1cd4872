"""Test configuration.

Tests run on CPU with 8 virtual devices so that (a) jit compiles are fast
and deterministic, and (b) multi-chip sharding paths (jax.sharding.Mesh
over the sequence axis) are exercised without TPU hardware.  Benchmarks
(bench.py) run on the real chip instead.

Note: this environment's sitecustomize registers a remote TPU backend and
calls jax.config.update("jax_platforms", "axon,cpu") at interpreter
startup, so JAX_PLATFORMS env vars are ignored — we must override via
jax.config here, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
