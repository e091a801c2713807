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

rng = np.random.default_rng(1234)
codes = jnp.asarray(rng.integers(0, 4, (B, L_buf), dtype=np.uint32))
fresh = jnp.zeros((B,), dtype=bool)
valid_end = jnp.full((B,), L_buf, dtype=jnp.int32)
carry = enum_ops.zero_carry(B)
total = B * L


def bench(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree.leaves(out))
    return (time.time() - t0) / n


# 1. full enumerate_batch
t = bench(lambda: enum_ops.enumerate_batch(codes, fresh, valid_end, carry, k=k, m=m, b=b))
print(f"enumerate_batch: {t*1e3:8.2f} ms  {total/t/1e9:6.2f} Gkmer/s")

# 2. position pipeline only
pp = jax.jit(lambda c: minimizer.position_pipeline(c, k, m))
t = bench(pp, codes)
print(f"position_pipeline: {t*1e3:6.2f} ms  {total/t/1e9:6.2f} Gkmer/s")

# 3. windowed_get_minimizer
@jax.jit
def wgm(c):
    pa = minimizer.position_pipeline(c, k, m)
    return minimizer.windowed_get_minimizer(pa, pa.fwd_k, k, m)
t = bench(wgm, codes)
print(f"pipeline+rescan: {t*1e3:8.2f} ms  {total/t/1e9:6.2f} Gkmer/s")

# 4. store append path
em, carry2 = enum_ops.enumerate_batch(codes, fresh, valid_end, carry, k=k, m=m, b=b)
jax.block_until_ready(em.key)
st = store.empty(1 << 26)

@jax.jit
def app(st, em):
    rows = store.make_keys(em.bucket.reshape(-1), em.key.reshape(4, -1),
                           em.mini_idx.reshape(-1))
    return store.append(st, rows, jnp.ones(rows.shape[1], dtype=jnp.uint32),
                        em.valid.reshape(-1))
t = bench(app, st, em)
print(f"append: {t*1e3:15.2f} ms  {total/t/1e9:6.2f} Gkmer/s")

st2 = app(st, em)
jax.block_until_ready(st2.keys)
t = bench(store.compact, st2)
print(f"compact(1<<26): {t*1e3:7.2f} ms")
