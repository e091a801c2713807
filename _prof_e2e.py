import time, os
import numpy as np
import jax
from brisk_tpu.api import Brisk
from brisk_tpu.params import Parameters
from brisk_tpu.index import pipeline, sklstore

path = "/tmp/bench_synth_5mb.fa"

# instrument
orig_iws = pipeline.insert_windows_skl
def timed_iws(*a, **k):
    t0 = time.time()
    out = orig_iws(*a, **k)
    jax.block_until_ready(out[0].keys)
    print(f"  insert_windows_skl: {time.time()-t0:.2f}s")
    return out
pipeline.insert_windows_skl = timed_iws

orig_erc = sklstore.ensure_room_compressing
def timed_erc(st, n):
    t0 = time.time()
    out = orig_erc(st, n)
    jax.block_until_ready(out.bucket)
    print(f"  skl ensure_room: {time.time()-t0:.2f}s (rcap {st.bucket.shape[0]} -> {out.bucket.shape[0]}, n_rows {int(st.n_rows)})")
    return out
sklstore.ensure_room_compressing = timed_erc

br = Brisk(Parameters(k=31, m=11, b=8), batch=2048, window=512,
           capacity=1 << 24, stack=8)
t0 = time.time()
br.insert_file(path)
print(f"insert_file #1 (skl on, presized): {time.time()-t0:.2f}s")
t0 = time.time()
br.insert_file(path)
print(f"insert_file #2 (steady): {time.time()-t0:.2f}s")
print("emitted:", br.n_emitted)
