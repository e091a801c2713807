"""Benchmark: single-chip k-mer indexing throughput on real TPU hardware.

Measures the full device pipeline — batched super-k-mer enumeration,
hashed-key construction, index append, and final compaction — on a
synthetic random genome at the reference counter's primary config
(k=31 m=11 b=8, BASELINE.json config 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is against the reference C++ counter on this host
(4.43e6 k-mers/s with 2 threads, BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import store
from brisk_tpu.ops import enumerate as enum_ops

REF_BASELINE_KMERS_PER_S = 4.43e6  # reference counter, 2 threads (BASELINE.md)


def main():
    k, m, b = 31, 11, 8
    B, L = 4096, 1024
    n_batches = 8
    margin = k - 1
    L_buf = margin + L

    rng = np.random.default_rng(1234)
    batches = [jnp.asarray(rng.integers(0, 4, (B, L_buf), dtype=np.uint32))
               for _ in range(n_batches)]
    fresh = jnp.zeros((B,), dtype=bool)
    fresh0 = jnp.ones((B,), dtype=bool)
    valid_end = jnp.full((B,), L_buf, dtype=jnp.int32)

    total_kmers = B * L * n_batches
    state = store.empty(1 << 26)  # 67M entries

    def run():
        st = state
        carry = enum_ops.zero_carry(B)
        for i, codes in enumerate(batches):
            em, carry = enum_ops.enumerate_batch(
                codes, fresh0 if i == 0 else fresh, valid_end, carry,
                k=k, m=m, b=b)
            rows = store.make_keys(em.bucket.reshape(-1),
                                   em.key.reshape(4, -1),
                                   em.mini_idx.reshape(-1))
            st = store.append(st, rows,
                              jnp.ones(rows.shape[1], dtype=jnp.uint32),
                              em.valid.reshape(-1))
        return store.compact(st)

    # warmup (compile)
    st = run()
    jax.block_until_ready(st.keys)

    t0 = time.time()
    st = run()
    jax.block_until_ready(st.keys)
    elapsed = time.time() - t0

    value = total_kmers / elapsed
    print(json.dumps({
        "metric": "kmers_indexed_per_sec_single_chip_k31",
        "value": round(value),
        "unit": "kmers/s",
        "vs_baseline": round(value / REF_BASELINE_KMERS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
