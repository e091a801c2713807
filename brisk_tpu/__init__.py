"""brisk_tpu: TPU-native dynamic k-mer counting/indexing engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the Brisk
reference library (C++17, /root/reference): 2-bit-packed k-mers up to k=63,
minimizer-driven super-k-mer decomposition, and a dynamic minimizer-bucketed
dictionary mapping each k-mer to mutable per-k-mer payloads — here re-imagined
as batched, functional, sorted-array index state sharded over a TPU mesh
instead of mutexed pointer-chasing buckets.

Count parity contract: byte-exact against the reference `counter` app's
mode-2 oracle (reference apps/counter.cpp:247-258).
"""

import os as _os

import jax as _jax

# Some TPU plugins (the tunneled "axon" runtime here) override the
# JAX_PLATFORMS env var during registration; jax.config wins, so expose a
# package-level escape hatch (e.g. BRISK_TPU_PLATFORM=cpu for host runs).
_plat = _os.environ.get("BRISK_TPU_PLATFORM")
if _plat:
    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

# Persistent compilation cache: index kernels are recompiled per
# (batch, window, capacity) shape and TPU compiles are expensive
# (30-200s); the cache makes repeated runs (tests, bench, driver) warm.
#
# TPU-ONLY (round-4 fix): serializing/deserializing large XLA:CPU
# executables reproducibly SEGFAULTS (both the cache write of a freshly
# compiled k=63 program and the load of one cached by a machine with
# different CPU features — SIGILL hazard). The cache is therefore enabled
# lazily, only once the active backend is known to be a TPU. Set
# BRISK_TPU_CACHE=<dir> to force-enable regardless of backend (debug).
_cache_enabled = False


def enable_persistent_cache() -> bool:
    """Enable the persistent compilation cache if the active backend is a
    TPU (or BRISK_TPU_CACHE is set). Safe to call repeatedly; called by
    the entry points that are about to compile big programs (Brisk
    construction, the counter app, bench). Returns True when enabled."""
    global _cache_enabled
    if _cache_enabled:
        return True
    forced = _os.environ.get("BRISK_TPU_CACHE")
    try:
        if not forced:
            # the tunneled plugin registers as platform "axon" with
            # device_kind "TPU v5 lite" — accept any TPU device kind
            is_tpu = _jax.default_backend() == "tpu" or any(
                "tpu" in d.device_kind.lower() for d in _jax.devices())
            if not is_tpu:
                return False
        _cache_dir = forced or _os.path.join(
            _os.path.expanduser("~"), ".cache", "brisk_tpu_jax")
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:  # cache is an optimization, never fatal
        return False
    return True

from brisk_tpu.params import Parameters  # noqa: E402

__all__ = ["Parameters"]
__version__ = "0.1.0"
