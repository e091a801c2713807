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
    st = store.empty(64, 6)
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
    st = store.empty(32, 6)
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


def test_packed_key_roundtrip():
    """Device make_keys == host pack_key_np; unpack inverts; lex order of
    packed words == (bucket, kmer, mini_idx) order."""
    for k, bb in [(31, 8), (63, 14), (21, 6), (32, 15), (5, 2)]:
        W = store.key_words(k, bb)
        rows = []
        fields = []
        for _ in range(64):
            bucket = random.randrange(0, 1 << (2 * bb))
            kmer = random.getrandbits(2 * k)
            idx = random.randrange(0, max(1, k - 5))
            fields.append((bucket, kmer, idx))
            rows.append(store.pack_key_np(bucket, kmer, idx, k, bb))
        cols = np.stack(rows, axis=1)
        # device packing matches host packing
        limbs = np.zeros((4, 64), dtype=np.uint32)
        for j in range(4):
            limbs[j] = [(f[1] >> (32 * j)) & 0xFFFFFFFF for f in fields]
        dev = np.asarray(store.make_keys(
            jnp.asarray(np.array([f[0] for f in fields], dtype=np.uint32)),
            jnp.asarray(limbs),
            jnp.asarray(np.array([f[2] for f in fields], dtype=np.uint32)),
            k, bb))
        assert dev.shape == (W, 64)
        assert np.array_equal(dev, cols)
        # unpack inverts
        bu, hi, lo, mi = store.unpack_keys_np(cols, k, bb)
        for i, (bucket, kmer, idx) in enumerate(fields):
            got = (int(hi[i]) << 64) | int(lo[i])
            assert (int(bu[i]), got, int(mi[i])) == (bucket, kmer, idx)
        # lexicographic word order == field order
        order = sorted(range(64), key=lambda i: tuple(cols[:, i]))
        order2 = sorted(range(64), key=lambda i: fields[i])
        assert order == order2
        # bucket_of extraction (device)
        assert np.array_equal(
            np.asarray(store.bucket_of(jnp.asarray(cols), k, bb)),
            np.array([f[0] for f in fields], dtype=np.uint32))


def test_compact_fast_tombstones():
    """compact_fast: totals consolidated at each duplicate run's first
    column, later duplicates left as zero-data tombstones; lookup returns
    the consolidated totals; idempotent; full compact() agrees."""
    model = {}
    st = store.empty(1 << 10, 6)
    pool = [rand_key() for _ in range(40)]
    for step in range(4):
        batch = [random.choice(pool) for _ in range(60)]
        for kk in batch:
            model[kk] = model.get(kk, 0) + 1
        st = store.ensure_room(st, len(batch))
        st = store.append(st, to_cols(batch),
                          jnp.ones(len(batch), dtype=jnp.uint32),
                          jnp.ones(len(batch), dtype=bool))
        st = store.compact_fast(st)
    # lookup sees consolidated totals
    found, vals = store.lookup(st, to_cols(pool))
    for q, f, v in zip(pool, np.asarray(found), np.asarray(vals)):
        assert bool(f) == (q in model)
        if f:
            assert int(v) == model[q]
    # live (nonzero-data) columns == model exactly
    n = int(st.n_sorted)
    keys_np = np.asarray(st.keys)[:, :n].T
    data_np = np.asarray(st.data)[:n]
    got = {tuple(int(x) for x in kk): int(v)
           for kk, v in zip(keys_np, data_np) if v}
    assert got == model
    # idempotent
    st2 = store.compact_fast(st)
    assert np.array_equal(np.asarray(st2.keys), np.asarray(st.keys))
    assert np.array_equal(np.asarray(st2.data), np.asarray(st.data))
    # full compact from the tombstoned state agrees with the model
    stf = store.compact(st)
    assert int(stf.n_sorted) == len(model)


def test_compact_auto_equivalence():
    """compact_auto (pow2-prefix sort) == full compact."""
    model = {}
    st = store.empty(1 << 12, 6)
    for step in range(3):
        batch = [rand_key() for _ in range(100)] * 2
        for kk in batch:
            model[kk] = model.get(kk, 0) + 1
        st = store.ensure_room(st, len(batch))
        st = store.append(st, to_cols(batch),
                          jnp.ones(len(batch), dtype=jnp.uint32),
                          jnp.ones(len(batch), dtype=bool))
        st = store.compact_auto(st)
    assert int(st.n_sorted) == len(model)
    keys_np = np.asarray(st.keys)[:, : int(st.n_sorted)].T
    data_np = np.asarray(st.data)[: int(st.n_sorted)]
    got = {tuple(int(x) for x in kk): int(v)
           for kk, v in zip(keys_np, data_np)}
    assert got == model
    # region beyond n_sorted stays INVALID/0 (compact_auto write-back)
    tail = np.asarray(st.keys)[:, int(st.n_sorted):]
    assert np.all(tail == 0xFFFFFFFF)
    assert np.all(np.asarray(st.data)[int(st.n_sorted):] == 0)


def test_empty_and_grow():
    st = store.empty(4, 6)
    st = store.compact(st)
    assert int(st.n_sorted) == 0
    found, _ = store.lookup(st, to_cols([rand_key()]))
    assert not bool(found[0])
    st = store.ensure_room(st, 100)
    assert st.keys.shape[1] >= 100
