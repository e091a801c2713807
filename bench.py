"""Benchmark: single-chip k-mer indexing throughput on real TPU hardware.

Measures the full device pipeline — batched super-k-mer enumeration,
hashed-key construction, index append (fused multi-batch scan), and final
compaction — on a synthetic random genome at the reference counter's
primary config (k=31 m=11 b=8, BASELINE.json config 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the reference C++ counter on this host
(4.43e6 k-mers/s with 2 threads, BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import pipeline, store
from brisk_tpu.ops import enumerate as enum_ops

REF_BASELINE_KMERS_PER_S = 4.43e6  # reference counter, 2 threads (BASELINE.md)


def main():
    k, m, b = 31, 11, 8
    B, L = 4096, 1024
    n_batches = 8
    margin = k - 1
    L_buf = margin + L

    rng = np.random.default_rng(1234)
    codes = jnp.asarray(rng.integers(0, 4, (n_batches, B, L_buf),
                                     dtype=np.uint32))
    fresh = jnp.zeros((n_batches, B), dtype=bool).at[0].set(True)
    valid_end = jnp.full((n_batches, B), L_buf, dtype=jnp.int32)

    total_kmers = B * L * n_batches

    def run():
        st = store.empty(1 << 26)  # 67M entries
        carry = enum_ops.zero_carry(B)
        st, carry, _ = pipeline.insert_many(st, carry, codes, fresh,
                                            valid_end, k=k, m=m, b=b)
        st = store.compact(st)
        # A data-dependent host readback guarantees the device program has
        # fully executed before timing stops.
        return int(st.n_sorted) + int(st.keys[0, 0])

    run()  # warmup (compile)

    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    mean = sum(times) / len(times)

    value = total_kmers / mean
    print(json.dumps({
        "metric": "kmers_indexed_per_sec_single_chip_k31",
        "value": round(value),
        "unit": "kmers/s",
        "vs_baseline": round(value / REF_BASELINE_KMERS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
