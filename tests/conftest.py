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

# Persistent XLA compilation cache: the suite compiles the same tracker
# step programs (per tracker x capacity x det-width combo) across many
# files and all xdist workers; a shared on-disk cache dedups those
# compiles within a run and makes re-runs start warm.  Keyed by HLO
# hash, so code changes invalidate entries automatically.
# The cache is scoped per CPU microarchitecture: XLA:CPU AOT entries
# embed the compile machine's feature set and fail to load elsewhere
# ("Target machine feature +X is not supported on the host machine"),
# so a cache produced on one runner must not poison another.
import hashlib
import platform


def _machine_tag() -> str:
    # jax/jaxlib versions are part of the key: XLA:CPU AOT entries also
    # embed compiler-chosen pseudo-features (+prefer-no-scatter/gather)
    # that drift across jaxlib releases, and a dir mixing entries from
    # two XLA builds spams "Target machine feature +X is not supported"
    # loader errors (and risks the in-run backend_compile_and_load
    # segfault flake) even on the very same CPU.
    import jax as _jax
    import jaxlib as _jaxlib

    bits = [
        platform.machine(),
        platform.processor() or "",
        _jax.__version__,
        getattr(_jaxlib, "__version__", ""),
    ]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    bits.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


_CACHE_DIR = os.path.join(
    os.path.dirname(__file__), ".jax_cache", _machine_tag()
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
