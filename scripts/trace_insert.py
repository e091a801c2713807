"""Capture a jax.profiler trace of the fused insert program + finalize
(VERDICT r3 item 10 / SURVEY §5.1: the TPU-native equivalent of the
reference's chrono stats, counter.cpp:375-404).

Usage:  python scripts/trace_insert.py [out_dir]
Writes a TensorBoard-loadable trace under out_dir (default
/tmp/brisk_trace) and prints the per-stage wall clocks it measured.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import pipeline, sklstore
from brisk_tpu.io import windows


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/brisk_trace"
    k, m, b = 31, 11, 8
    B, W, S = 2048, 512, 8
    row_cap = max(16, W // 4)
    packer = windows.WindowPacker(k, m, batch=B, l_out=W)
    rng = np.random.default_rng(7)
    rec = rng.integers(0, 4, 8_000_000, dtype=np.uint8)
    fl = next(packer.pack_flat(iter([rec]), S))
    st = (jnp.asarray(fl.chunk4),
          jnp.asarray(fl.valid_start.reshape(S, B)),
          jnp.asarray(fl.valid_end.reshape(S, B)))
    _, _, _, nw = sklstore.skl_dims(k, m, b)
    skl = sklstore.empty(1 << 23, 1 << 14, nw)
    chain = pipeline.zero_chain()

    def flush(sk, ch):
        o = pipeline.insert_flat_sklnative(
            sk, st[0], st[1], st[2], ch, k=k, m=m, b=b,
            row_cap=row_cap, l_buf=packer.l_buf, useful=packer.useful)
        return o[0], o[6], o[5]

    skl, chain, nr = flush(skl, chain)  # compile outside the trace
    int(nr)
    t0 = time.time()
    with jax.profiler.trace(out):
        skl, chain, nr = flush(skl, chain)
        int(nr)
        t1 = time.time()
        skl = sklstore.finalize_device(skl, k, m, b)
        int(skl.n_fin_kmers)
        t2 = time.time()
    print(f"trace written to {out}")
    print(f"insert flush: {t1 - t0:.3f}s   finalize: {t2 - t1:.3f}s")


if __name__ == "__main__":
    main()
