import time
import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import store

N = 1 << 24
rng = np.random.default_rng(0)
keys = jnp.asarray(rng.integers(0, 2**32, (6, N), dtype=np.uint64).astype(np.uint32))
data = jnp.ones((N,), dtype=jnp.uint32)

st = store.empty(N)
st = store.append(st, keys, data, jnp.ones((N,), dtype=bool))

# force full materialization via a scalar reduce fetched to host
red = jax.jit(lambda s: (jnp.sum(s.keys, dtype=jnp.uint32), jnp.sum(s.data, dtype=jnp.uint32)))
_ = [int(x) for x in red(st)]

out = store.compact(st)
_ = [int(x) for x in red(out)]  # ensure compiled+done

for trial in range(3):
    st2 = st._replace(data=st.data + np.uint32(trial))
    _ = [int(x) for x in red(st2)]
    t0 = time.time()
    out = store.compact(st2)
    s = [int(x) for x in red(out)]
    dt = time.time() - t0
    print(f"compact 16M (forced) trial {trial}: {dt*1e3:.2f} ms  -> {N/dt/1e9:.2f} G rows/s")
