import time
import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import store
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.ops import minimizer

k, m, b = 31, 11, 8
B, L = 4096, 1024
margin = k - 1
L_buf = margin + L
total = B * L

rng = np.random.default_rng(1234)
codes = jnp.asarray(rng.integers(0, 4, (B, L_buf), dtype=np.uint32))
fresh = jnp.zeros((B,), dtype=bool)
valid_end = jnp.full((B,), L_buf, dtype=jnp.int32)
carry = enum_ops.zero_carry(B)


def force(x):
    leaves = jax.tree.leaves(x)
    return [np.asarray(jnp.sum(l.astype(jnp.uint32) if l.dtype != bool else l)) for l in leaves[:1]]


def bench(label, fn, *args, n=3, per=total):
    out = fn(*args)
    force(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
        force(out)
    dt = (time.time() - t0) / n
    print(f"{label:30s} {dt*1e3:9.2f} ms   {per/dt/1e9:7.3f} G/s")
    return dt


bench("enumerate_batch", lambda: enum_ops.enumerate_batch(codes, fresh, valid_end, carry, k=k, m=m, b=b))

pp = jax.jit(lambda c: minimizer.position_pipeline(c, k, m))
bench("position_pipeline", pp, codes)

@jax.jit
def wgm(c):
    pa = minimizer.position_pipeline(c, k, m)
    return minimizer.windowed_get_minimizer(pa, pa.fwd_k, k, m)
bench("pipeline+rescan", wgm, codes)

em, carry2 = enum_ops.enumerate_batch(codes, fresh, valid_end, carry, k=k, m=m, b=b)
force(em.key)
st = store.empty(1 << 26)

@jax.jit
def app(st, em):
    rows = store.make_keys(em.bucket.reshape(-1), em.key.reshape(4, -1),
                           em.mini_idx.reshape(-1))
    return store.append(st, rows, jnp.ones(rows.shape[1], dtype=jnp.uint32),
                        em.valid.reshape(-1))
bench("append(cap 64M)", app, st, em)

st2 = app(st, em)
force(st2.keys)
bench("compact(cap 64M)", store.compact, st2, per=1 << 26)

st3 = store.empty(1 << 22)
st3 = store.append(st3, store.make_keys(em.bucket.reshape(-1)[: 1 << 22],
                                        em.key.reshape(4, -1)[:, : 1 << 22],
                                        em.mini_idx.reshape(-1)[: 1 << 22]),
                   jnp.ones((1 << 22,), dtype=jnp.uint32),
                   em.valid.reshape(-1)[: 1 << 22])
force(st3.keys)
bench("compact(cap 4M)", store.compact, st3, per=1 << 22)
