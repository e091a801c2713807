"""Index store: append/compact/lookup vs a dict model."""
import random

import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import store

random.seed(5)


def rand_key():
    return (random.randrange(0, 1 << 16),) + tuple(
        random.getrandbits(32) for _ in range(4)) + (
        random.randrange(0, 60),)


def to_cols(keys):
    a = np.array(keys, dtype=np.uint32).T
    return jnp.asarray(a)


def test_append_compact_lookup():
    model = {}
    st = store.empty(64)
    pool = [rand_key() for _ in range(300)]
    for step in range(10):
        batch = [random.choice(pool) for _ in range(50)]
        valid = [random.random() < 0.9 for _ in range(50)]
        for kk, v in zip(batch, valid):
            if v:
                model[kk] = model.get(kk, 0) + 1
        st = store.ensure_room(st, 50)
        st = store.append(st, to_cols(batch),
                          jnp.ones(50, dtype=jnp.uint32),
                          jnp.asarray(valid))
    st = store.compact(st)
    assert int(st.n_sorted) == len(model)
    # stored keys sorted ascending and match the model exactly
    keys_np = np.asarray(st.keys)[:, : int(st.n_sorted)].T
    data_np = np.asarray(st.data)[: int(st.n_sorted)]
    got = {tuple(int(x) for x in kk): int(v)
           for kk, v in zip(keys_np, data_np)}
    assert got == model
    # lookup hits and misses
    queries = pool[:80] + [rand_key() for _ in range(20)]
    found, vals = store.lookup(st, to_cols(queries))
    for q, f, v in zip(queries, np.asarray(found), np.asarray(vals)):
        assert bool(f) == (q in model), q
        if f:
            assert int(v) == model[q]


def test_incremental_compactions():
    """compact mid-stream must be equivalent to one big compact."""
    model = {}
    st = store.empty(32)
    for step in range(8):
        batch = [rand_key() for _ in range(20)]
        # duplicate some inside the batch
        batch += batch[:10]
        for kk in batch:
            model[kk] = model.get(kk, 0) + 1
        st = store.ensure_room(st, len(batch))
        st = store.append(st, to_cols(batch),
                          jnp.ones(len(batch), dtype=jnp.uint32),
                          jnp.ones(len(batch), dtype=bool))
        if step % 3 == 0:
            st = store.compact(st)
    st = store.compact(st)
    keys_np = np.asarray(st.keys)[:, : int(st.n_sorted)].T
    data_np = np.asarray(st.data)[: int(st.n_sorted)]
    got = {tuple(int(x) for x in kk): int(v)
           for kk, v in zip(keys_np, data_np)}
    assert got == model


def test_empty_and_grow():
    st = store.empty(4)
    st = store.compact(st)
    assert int(st.n_sorted) == 0
    found, _ = store.lookup(st, to_cols([rand_key()]))
    assert not bool(found[0])
    st = store.ensure_room(st, 100)
    assert st.keys.shape[1] >= 100
