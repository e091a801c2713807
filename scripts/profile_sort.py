"""Measure lax.sort / segment-scan / gather costs on the real TPU at the
bench scale (n=2^25 rows) to size the store redesign.

Every benched fn returns an ORDER-DEPENDENT digest (xor with rolled self,
then sum) so XLA cannot shortcut the sort into a reduction."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N = 1 << 25


def digest(o):
    return jnp.sum(o ^ jnp.roll(o, 1))


def force(out):
    # On the tunneled runtime block_until_ready can return before the
    # program finishes; a host readback of a data-dependent scalar is the
    # only reliable completion barrier.
    return [int(np.asarray(x).reshape(-1)[0])
            for x in jax.tree.leaves(out)]


def bench(label, fn, *args, n=3):
    force(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        force(fn(*args))
        ts.append(time.time() - t0)
    t = sorted(ts)[len(ts) // 2]
    print(f"{label:42s} {t * 1e3:9.2f} ms  {N / t / 1e6:8.1f} Mrows/s",
          flush=True)
    return t


@jax.jit
def gen(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 8)
    return [jax.random.bits(k, (N,), dtype=jnp.uint32) for k in ks]


cols = gen(0)
jax.block_until_ready(cols)


@partial(jax.jit, static_argnames=("nk", "npay"))
def do_sort(cols, nk, npay):
    ops = tuple(cols[:nk + npay])
    out = jax.lax.sort(ops, num_keys=nk)
    return [digest(o) for o in out]


for nk, npay in [(3, 1), (1, 1), (1, 3), (2, 2), (6, 1), (2, 1), (1, 0)]:
    bench(f"lax.sort num_keys={nk} payload={npay}",
          lambda nk=nk, npay=npay: do_sort(cols, nk, npay))


@jax.jit
def scans(cols):
    x = cols[0]
    first = x != jnp.roll(x, 1)
    csum = jnp.cumsum(cols[1], dtype=jnp.uint32)
    base = jax.lax.cummax(jnp.where(first, csum - cols[1], 0))
    return digest(base) + digest(csum)


bench("dedup scans (cumsum+cummax)", scans, cols)


@jax.jit
def gather4(cols):
    idx = (cols[0] >> jnp.uint32(7)) & jnp.uint32(N - 1)
    return [digest(c[idx]) for c in cols[:4]]


bench("random gather x4 cols", gather4, cols)


@jax.jit
def bitonic_merge(cols):
    """Merge two sorted halves (simulated): log(N) compare-exchange
    stages on a 2-key row, pure elementwise."""
    a, b, c, d = cols[:4]

    def stage(arrs, stride):
        a, b, c, d = arrs
        sh = lambda x: x.reshape(-1, 2, stride)
        ua, ub, uc, ud = sh(a), sh(b), sh(c), sh(d)
        lt = (ua[:, 0] < ua[:, 1]) | ((ua[:, 0] == ua[:, 1]) &
                                      (ub[:, 0] <= ub[:, 1]))

        def ex(u):
            lo = jnp.where(lt, u[:, 0], u[:, 1])
            hi = jnp.where(lt, u[:, 1], u[:, 0])
            return jnp.stack([lo, hi], 1).reshape(-1)

        return ex(ua), ex(ub), ex(uc), ex(ud)

    arrs = (a, b, c, d)
    stride = N // 2
    while stride >= 1:
        arrs = stage(arrs, stride)
        stride //= 2
    return [digest(x) for x in arrs]


bench("bitonic MERGE 4 cols (25 stages)", bitonic_merge, cols)


@partial(jax.jit, static_argnames=("rows",))
def batched_sort(cols, rows):
    """Sort each row independently: (rows, N/rows) along axis -1."""
    ops = tuple(c.reshape(rows, -1) for c in cols[:4])
    out = jax.lax.sort(ops, num_keys=3, dimension=1)
    return [digest(o.reshape(-1)) for o in out]


bench("row-sorted (1024, 32K) 3key+1pay", batched_sort, cols, 1024)
bench("row-sorted (128, 256K) 3key+1pay", batched_sort, cols, 128)
