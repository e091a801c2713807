import time
import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import store

N = 1 << 24  # 16M
rng = np.random.default_rng(0)
keys_np = rng.integers(0, 2**32, (6, N), dtype=np.uint64).astype(np.uint32)
keys = jnp.asarray(keys_np)
data = jnp.ones((N,), dtype=jnp.uint32)

st = store.empty(N)
st = store.append(st, keys, data, jnp.ones((N,), dtype=bool))
jax.block_until_ready(st.keys)

# time single compact, fresh each time with different n_used to defeat caching
for trial in range(3):
    t0 = time.time()
    out = store.compact(st)
    out.keys.block_until_ready()
    print(f"compact 16M trial {trial}: {(time.time()-t0)*1e3:.2f} ms")

# vary the input slightly each time
for trial in range(3):
    st2 = st._replace(data=st.data + np.uint32(trial))
    jax.block_until_ready(st2.data)
    t0 = time.time()
    out = store.compact(st2)
    out.keys.block_until_ready()
    print(f"compact varied trial {trial}: {(time.time()-t0)*1e3:.2f} ms")

# raw lax.sort timing
srt = jax.jit(lambda k: jax.lax.sort(tuple(k[i] for i in range(6)), num_keys=6))
out = srt(keys); jax.block_until_ready(out)
t0 = time.time()
out = srt(keys)
jax.block_until_ready(out)
print(f"lax.sort 6x16M u32: {(time.time()-t0)*1e3:.2f} ms")
