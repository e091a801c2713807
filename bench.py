"""Benchmark: single-chip k-mer indexing throughput on real TPU hardware.

Primary metric: the full device pipeline — batched super-k-mer
enumeration, packed-key construction, fused multi-batch index append, and
the product compaction (compact_auto fast mode) — on a synthetic random
genome at the reference counter's primary config (k=31 m=11 b=8,
BASELINE.json config 1). Completion is forced by host readback (on the
tunneled runtime block_until_ready can return before execution ends).

Also measured: end-to-end Brisk.insert_file on a 50 Mb synthetic FASTA
(host parse + window packing + device pipeline), reported as extra JSON
fields (VERDICT r1 item 2).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
vs_baseline is against the reference C++ counter on this host
(4.43e6 k-mers/s with 2 threads, BASELINE.md).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import pipeline, store
from brisk_tpu.ops import enumerate as enum_ops

REF_BASELINE_KMERS_PER_S = 4.43e6  # reference counter, 2 threads (BASELINE.md)


def device_bench():
    k, m, b = 31, 11, 8
    B, L = 4096, 1024
    n_batches = 8
    margin = k - 1
    L_buf = margin + L

    rng = np.random.default_rng(1234)
    codes = jnp.asarray(rng.integers(0, 4, (n_batches, B, L_buf),
                                     dtype=np.uint8))
    fresh = jnp.zeros((n_batches, B), dtype=bool).at[0].set(True)
    valid_end = jnp.full((n_batches, B), L_buf, dtype=jnp.int32)

    total_kmers = B * L * n_batches

    def run():
        st = store.empty(1 << 26, store.key_words(k, b))
        carry = enum_ops.zero_carry(B)
        st, carry, _ = pipeline.insert_many(st, carry, codes, fresh,
                                            valid_end, k=k, m=m, b=b)
        st = store.compact_auto(st, full=False)
        # data-dependent host readback = reliable completion barrier
        return int(st.n_sorted) + int(st.keys[0, 0])

    run()  # warmup (compile)

    times = []
    for _ in range(3):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    mean = sum(times) / len(times)
    return total_kmers / mean


def e2e_bench():
    """Brisk.insert_file on a 50 Mb synthetic FASTA, host I/O included."""
    from brisk_tpu.api import Brisk
    from brisk_tpu.params import Parameters
    from tests.make_synth_fasta import write_synth

    path = "/tmp/bench_synth_50mb.fa"
    if not os.path.exists(path):
        write_synth(path, n_bases=50_000_000, read_len=10_000, seed=1234)
    br = Brisk(Parameters(k=31, m=11, b=8), batch=2048, window=512,
               capacity=1 << 26, stack=8)
    t0 = time.time()
    br.insert_file(path)
    n = int(br.state.n_sorted) + int(br.state.keys[0, 0])  # barrier
    elapsed = time.time() - t0
    return br.n_emitted / elapsed


def main():
    import sys
    t0 = time.time()
    value = device_bench()
    print(f"[bench] device_bench done in {time.time() - t0:.1f}s",
          file=sys.stderr, flush=True)
    t1 = time.time()
    try:
        e2e = e2e_bench()
    except Exception as e:  # never lose the primary metric
        import traceback
        traceback.print_exc()
        e2e = 0.0
    print(f"[bench] e2e_bench done in {time.time() - t1:.1f}s",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "kmers_indexed_per_sec_single_chip_k31",
        "value": round(value),
        "unit": "kmers/s",
        "vs_baseline": round(value / REF_BASELINE_KMERS_PER_S, 2),
        "e2e_insert_file_50mb_kmers_per_sec": round(e2e),
    }))


if __name__ == "__main__":
    main()
