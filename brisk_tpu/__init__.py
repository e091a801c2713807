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
try:
    _cache_dir = _os.environ.get(
        "BRISK_TPU_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "brisk_tpu_jax"))
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # cache is an optimization, never fatal
    pass

from brisk_tpu.params import Parameters  # noqa: E402

__all__ = ["Parameters"]
__version__ = "0.1.0"
