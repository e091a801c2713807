"""Stage-by-stage device profiling of the insert pipeline on real TPU.

Breaks the bench workload (k=31 m=11 b=8, B=4096 x L=1024 x 8 batches)
into stages. Completion is forced by host readback of a data-dependent
scalar — on the tunneled runtime block_until_ready can return early.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import pipeline, store
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.ops import minimizer

k, m, b = 31, 11, 8
B, L = 4096, 1024
S = 8
margin = k - 1
L_buf = margin + L
W = store.key_words(k, b)

rng = np.random.default_rng(1234)
codes_s = jnp.asarray(rng.integers(0, 4, (S, B, L_buf), dtype=np.uint8))
codes = codes_s[0]
fresh_s = jnp.zeros((S, B), dtype=bool).at[0].set(True)
valid_end_s = jnp.full((S, B), L_buf, dtype=jnp.int32)
total = B * L * S


def force(out):
    leaves = jax.tree.leaves(out)
    acc = 0
    for x in leaves[:2]:
        acc += int(np.asarray(x).reshape(-1)[0])
    return acc


def bench(label, fn, *args, n=3, per=None):
    force(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2]
    rate = f"  {per / t / 1e6:9.1f} Mkmer/s" if per else ""
    print(f"{label:38s} {t * 1e3:9.2f} ms{rate}", flush=True)
    return t


@jax.jit
def pp_digest(c):
    pa = minimizer.position_pipeline(c, k, m)
    return pa.cand_hash[2][:, -1], pa.fwd_k[0][:, -1]


bench("position_pipeline (1 batch)", pp_digest, codes, per=B * L)


@jax.jit
def rescan_fn(c):
    pa = minimizer.position_pipeline(c, k, m)
    st = minimizer.windowed_get_minimizer(pa, pa.fwd_k, k, m)
    return st.hash_lo[:, -1], st.pos[:, -1]


bench("pipeline+rescan (1 batch)", rescan_fn, codes, per=B * L)

carry = enum_ops.zero_carry(B)


@jax.jit
def enum_digest(c):
    em, end = enum_ops.enumerate_batch(c, fresh_s[0], valid_end_s[0],
                                       carry, k=k, m=m, b=b)
    return em.key[0, :, -1], end.pos


bench("enumerate_batch (1 batch)", enum_digest, codes, per=B * L)

CAP = 1 << 26


def run_insert(fast=None):
    st = store.empty(CAP, W)
    cy = enum_ops.zero_carry(B)
    st, cy, nsk = pipeline.insert_many(st, cy, codes_s, fresh_s,
                                       valid_end_s, k=k, m=m, b=b)
    if fast is not None:
        st = store.compact_auto(st, full=not fast)
    return st.n_sorted, st.keys[0, :2]


bench("insert_many S=8 (no compact)", run_insert, per=total)
bench("insert + compact_auto FULL", lambda: run_insert(fast=False),
      per=total)
bench("insert + compact_auto FAST", lambda: run_insert(fast=True),
      per=total)
