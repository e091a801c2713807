"""Multi-chip sharded index: data-parallel reads, minimizer-space sharding.

The reference's only concurrency story is OpenMP threads + per-minimizer
lock groups in shared memory (DenseMenuYo.hpp:110-118). The TPU-native
equivalent (SURVEY §2 parallelism table):

  * record lanes are DATA-PARALLEL across chips (each chip enumerates its
    own shard of the batch);
  * the index is sharded by REDUCED MINIMIZER: chip d owns every bucket
    with bucket % n_shards == d (the modulo mirrors the reference's
    `minimizer % mutex_number` lock-group keying, DenseMenuYo.hpp:150);
  * emissions are routed to their owner chip with a capacity-bounded
    lax.all_to_all over the mesh axis, then appended to the owner's local
    log — the lock-free batch analog of insert_kmer_vector under
    MutexBucket.

Everything is one jitted shard_map step: (sharded index, sharded batch,
sharded carry) -> (sharded index', sharded carry', stats). Routing slots
that overflow the per-destination capacity are counted and returned so the
caller can re-run with more headroom (they are NOT silently dropped:
callers must check).
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from brisk_tpu.index import store
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.ops.minimizer import MinimizerState

U32 = np.uint32  # numpy scalar: avoids device-constant embedding at trace time
_INVALID = U32(0xFFFFFFFF)


class ShardedStats(NamedTuple):
    n_emitted: jnp.ndarray   # global emissions this step
    n_routed: jnp.ndarray    # rows that fit the routing capacity
    n_dropped: jnp.ndarray   # rows lost to capacity overflow (must be 0)
    n_boundaries: jnp.ndarray


def make_mesh(n_devices: int) -> Mesh:
    devices = jax.devices()[:n_devices]
    if len(devices) < n_devices:
        raise ValueError(
            f"need {n_devices} devices, have {len(jax.devices())}")
    return Mesh(devices, axis_names=("x",))


def _route_local(rows: jnp.ndarray, bucket: jnp.ndarray, valid: jnp.ndarray,
                 n_shards: int, cap: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pack (W, N) packed-key rows into an (n_shards, cap, W) routing
    buffer by destination shard (bucket % n_shards). Returns
    (buffer, n_dropped)."""
    W = rows.shape[0]
    n = rows.shape[1]
    dest = jnp.where(valid, bucket % U32(n_shards), U32(n_shards))
    ops = (dest,) + tuple(rows[i] for i in range(W))
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    dest_s = sorted_ops[0]
    rows_s = jnp.stack(sorted_ops[1:])
    counts = jnp.bincount(dest_s.astype(jnp.int32), length=n_shards + 1)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - offsets[dest_s]
    ok = (rank < cap) & (dest_s < U32(n_shards))
    flat = jnp.where(ok, dest_s.astype(jnp.int32) * cap + rank,
                     n_shards * cap)  # out-of-bounds -> dropped
    buf = jnp.full((n_shards * cap, W), _INVALID, dtype=U32)
    buf = buf.at[flat].set(rows_s.T, mode="drop")
    n_dropped = jnp.sum((~ok) & (dest_s < U32(n_shards)))
    return buf.reshape(n_shards, cap, W), n_dropped


@partial(jax.jit,
         static_argnames=("k", "m", "b", "mesh", "route_cap"))
def sharded_insert_step(state: store.IndexState, codes: jnp.ndarray,
                        fresh: jnp.ndarray, valid_end: jnp.ndarray,
                        carry: MinimizerState, k: int, m: int, b: int,
                        mesh: Mesh, route_cap: int
                        ) -> Tuple[store.IndexState, MinimizerState,
                                   ShardedStats]:
    """One distributed insert step over mesh axis "x".

    Sharded shapes (global):
      state.keys (n, W, cap), state.data (n, cap), state.n_* (n,)
      codes (B, L_buf) with B = n * B_local; fresh/valid_end (B,)
      carry: MinimizerState of (B,) arrays
    """
    n_shards = mesh.shape["x"]

    def step(st_keys, st_data, st_ns, st_nu, codes, fresh, valid_end,
             carry):
        # drop the leading shard axis of the index state
        local = store.IndexState(st_keys[0], st_data[0], st_ns[0], st_nu[0])
        em, carry2 = enum_ops.enumerate_batch(
            codes, fresh, valid_end, carry, k=k, m=m, b=b)
        key = em.key.reshape(4, -1)
        rows = store.make_keys(em.bucket.reshape(-1), key,
                               em.mini_idx.reshape(-1), k, b)
        valid = em.valid.reshape(-1)

        buf, n_dropped = _route_local(rows, em.bucket.reshape(-1), valid,
                                      n_shards, route_cap)
        routed = jax.lax.all_to_all(buf, "x", split_axis=0, concat_axis=0,
                                    tiled=True)
        # NOTE capacity contract: append consumes n_shards*route_cap RAW
        # log slots per step (tombstones included); callers must compact
        # (sharded_compact) often enough that
        # n_sorted + n_shards*route_cap <= capacity before each step.
        rcv = routed.reshape(-1, store.key_words(k, b)).T
        rcv_valid = rcv[0] != _INVALID
        local = store.append(local, rcv,
                             jnp.ones(rcv.shape[1], dtype=U32), rcv_valid)

        stats = ShardedStats(
            n_emitted=jax.lax.psum(jnp.sum(valid), "x"),
            n_routed=jax.lax.psum(jnp.sum(rcv_valid), "x"),
            n_dropped=jax.lax.psum(n_dropped, "x"),
            n_boundaries=jax.lax.psum(
                jnp.sum(em.boundary & em.valid), "x"))
        return (local.keys[None], local.data[None], local.n_sorted[None],
                local.n_used[None], carry2, stats)

    specs_state = (P("x"), P("x"), P("x"), P("x"))
    out = jax.shard_map(
        step, mesh=mesh,
        in_specs=specs_state + (P("x"), P("x"), P("x"),
                                jax.tree.map(lambda _: P("x"), carry)),
        out_specs=specs_state + (jax.tree.map(lambda _: P("x"), carry),
                                 jax.tree.map(lambda _: P(), ShardedStats(
                                     0, 0, 0, 0))),
        check_vma=False,
    )(state.keys, state.data, state.n_sorted, state.n_used,
      codes, fresh, valid_end, carry)
    keys, data, ns, nu, carry2, stats = out
    return store.IndexState(keys, data, ns, nu), carry2, stats


@partial(jax.jit, static_argnames=("mesh",))
def sharded_compact(state: store.IndexState, mesh: Mesh
                    ) -> store.IndexState:
    """Per-shard compaction (sort + dedupe + segment-sum)."""
    def cmp(keys, data, ns, nu):
        local = store.compact(store.IndexState(keys[0], data[0], ns[0],
                                               nu[0]))
        return (local.keys[None], local.data[None], local.n_sorted[None],
                local.n_used[None])

    specs = (P("x"), P("x"), P("x"), P("x"))
    out = jax.shard_map(cmp, mesh=mesh, in_specs=specs, out_specs=specs,
                        check_vma=False)(
        state.keys, state.data, state.n_sorted, state.n_used)
    return store.IndexState(*out)


def sharded_empty(n_shards: int, capacity: int, mesh: Mesh, nkey: int
                  ) -> store.IndexState:
    """Index state with a leading shard axis, placed sharded on the mesh."""
    sharding = NamedSharding(mesh, P("x"))
    return store.IndexState(
        keys=jax.device_put(
            jnp.full((n_shards, nkey, capacity), _INVALID, dtype=U32),
            sharding),
        data=jax.device_put(jnp.zeros((n_shards, capacity), dtype=U32),
                            sharding),
        n_sorted=jax.device_put(jnp.zeros((n_shards,), jnp.int32), sharding),
        n_used=jax.device_put(jnp.zeros((n_shards,), jnp.int32), sharding))
