"""Multi-chip sharded insert on an 8-device CPU mesh vs the oracle."""
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brisk_tpu.index import readout, store
from brisk_tpu.io.fasta import BatchPacker
from brisk_tpu.oracle import pyref
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.parallel import sharded
from brisk_tpu.params import Parameters

random.seed(11)


def rand_seq(n):
    return "".join(random.choice("ACGT") for _ in range(n))


@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (63, 21, 14)])
def test_sharded_count_parity(k, m, b):
    n_dev = 8
    mesh = sharded.make_mesh(n_dev)
    B, l_new = 16, 64
    records = [rand_seq(random.randint(k, 300)) for _ in range(30)]

    state = sharded.sharded_empty(n_dev, 16384, mesh,
                                  store.key_words(k, b))
    carry = enum_ops.zero_carry(B)
    packer = BatchPacker(k, B, l_new)
    total_spilled = 0
    for bt in packer.pack(iter(records)):
        state, carry, stats = sharded.sharded_insert_step(
            state, jnp.asarray(bt.codes, dtype=jnp.uint32),
            jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end), carry,
            k=k, m=m, b=b, mesh=mesh, route_cap=512)
        total_spilled += int(stats.n_spilled)
        assert int(stats.n_emitted) == bt.n_kmers
        assert int(stats.n_routed) == bt.n_kmers
        # uphold the raw-slot capacity contract (see sharded_insert_step)
        state = sharded.sharded_compact(state, mesh)
    assert total_spilled == 0

    # merge shards and compare aggregated counts with the oracle
    params = Parameters(k=k, m=m, b=b)
    agg = {}
    for d in range(n_dev):
        local = store.IndexState(state.keys[d], state.data[d],
                                 state.n_sorted[d], state.n_used[d])
        kmers, counts, buckets = readout.entries(local, params)
        # shard ownership invariant (no spills at route_cap=512)
        assert all(int(bk) % 8 == d for bk in buckets)
        for kv, c in zip(kmers, counts):
            agg[kv] = (agg.get(kv, 0) + int(c)) % 256
    exp = {}
    dede = pyref.DecyclingSet(m)
    for seq in records:
        if len(seq) >= k:
            pyref.count_sequence(exp, seq, k, m, dede)
    assert agg == exp


def test_route_overflow_spills_without_loss():
    """Skew/overflow (GROGRO analog): with an absurdly small route_cap,
    overflow rows SPILL to their source shard instead of being dropped,
    and sharded_lookup still reads back exact totals."""
    mesh = sharded.make_mesh(8)
    k, m, b = 31, 11, 8
    B, l_new = 16, 64
    records = [rand_seq(300) for _ in range(16)]
    state = sharded.sharded_empty(8, 4096, mesh,
                                  store.key_words(31, 8))
    carry = enum_ops.zero_carry(B)
    packer = BatchPacker(k, B, l_new)
    bt = next(packer.pack(iter(records)))
    state, _, stats = sharded.sharded_insert_step(
        state, jnp.asarray(bt.codes, dtype=jnp.uint32),
        jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end), carry,
        k=k, m=m, b=b, mesh=mesh, route_cap=4)  # absurdly small
    assert int(stats.n_spilled) > 0
    assert int(stats.n_routed) + int(stats.n_spilled) == \
        int(stats.n_emitted)

    # no emission lost: aggregate counts across ALL shards == oracle
    state = sharded.sharded_compact(state, mesh)
    params = Parameters(k=k, m=m, b=b)
    agg = {}
    for d in range(8):
        local = store.IndexState(state.keys[d], state.data[d],
                                 state.n_sorted[d], state.n_used[d])
        kmers, counts, _ = readout.entries(local, params)
        for kv, c in zip(kmers, counts):
            agg[kv] = (agg.get(kv, 0) + int(c)) % 256
    exp = {}
    dede = pyref.DecyclingSet(m)
    for seq in records[:B]:
        pyref.count_sequence(exp, seq[:l_new + k - 1], k, m, dede)
    assert agg == exp
