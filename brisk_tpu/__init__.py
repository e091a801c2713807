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

from brisk_tpu.params import Parameters

__all__ = ["Parameters"]
__version__ = "0.1.0"
