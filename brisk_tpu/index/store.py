"""Functional sorted-array k-mer index (the TPU-native DenseMenuYo/Bucket).

The reference stores each bucket as realloc'd arrays of compacted
super-k-mers with a sorted prefix + unsorted tail, merged under OpenMP
locks (buckets.hpp:166-189, DenseMenuYo.hpp). Here the whole index is a
single immutable pytree of flat arrays — a log-structured merge state:

  * keys: (6, cap) uint32 — lexicographic key per stored k-mer entry:
        (bucket, key3, key2, key1, key0, mini_idx)
    where key3..key0 are the limbs of the HASHED k-mer (minimizer slice
    replaced by its 2m-bit hash — identical identity to the reference's
    per-bucket compacted match, see SURVEY §2 C8/C9: bucket id + compacted
    value + alignment <=> (hashed k-mer, minimizer_idx)).
  * data: (cap,) uint32 payload per entry (counts for the counter app; the
    generic DATA story keeps a parallel array pytree).
  * n_sorted: entries [0, n_sorted) are sorted+deduped; [n_sorted, n_used)
    are a raw unsorted log appended by insert batches (the reference's
    unsorted tail, buckets.hpp:166).

All operations are pure jitted functions state -> state'; "growth" doubles
capacity host-side (outside jit), which retriggers compilation only per
capacity (powers of two).

Count semantics: inserts append (key, 1) rows; compaction segment-sums
duplicates. Counts are accumulated in uint32 and reduced mod 256 only at
read-out, matching the reference's uint8 wrap (counter.cpp:262-269).
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

U32 = np.uint32  # numpy scalar: avoids device-constant embedding at trace time
NKEY = 6


class IndexState(NamedTuple):
    keys: jnp.ndarray      # (NKEY, cap) uint32
    data: jnp.ndarray      # (cap,) uint32
    n_sorted: jnp.ndarray  # () int32
    n_used: jnp.ndarray    # () int32


def empty(capacity: int) -> IndexState:
    return IndexState(
        keys=jnp.full((NKEY, capacity), 0xFFFFFFFF, dtype=U32),
        data=jnp.zeros((capacity,), dtype=U32),
        n_sorted=jnp.int32(0),
        n_used=jnp.int32(0))


def grow(state: IndexState, new_capacity: int) -> IndexState:
    """Host-side capacity doubling (pure reshape, no recompute)."""
    cap = state.keys.shape[1]
    assert new_capacity > cap
    pad = new_capacity - cap
    return IndexState(
        keys=jnp.pad(state.keys, ((0, 0), (0, pad)),
                     constant_values=np.uint32(0xFFFFFFFF)),
        data=jnp.pad(state.data, (0, pad)),
        n_sorted=state.n_sorted, n_used=state.n_used)


def make_keys(bucket: jnp.ndarray, key_limbs: jnp.ndarray,
              mini_idx: jnp.ndarray) -> jnp.ndarray:
    """Assemble (NKEY, N) sort keys from emission fields. key_limbs is
    (4, N) little-endian; sort order wants big limbs first."""
    return jnp.stack([bucket, key_limbs[3], key_limbs[2], key_limbs[1],
                      key_limbs[0], mini_idx])


_INVALID = U32(0xFFFFFFFF)


def _lex_sort(keys: jnp.ndarray, *payloads):
    """Sort columns of (NKEY, N) lexicographically, carrying payloads."""
    ops = tuple(keys[i] for i in range(NKEY)) + tuple(payloads)
    out = jax.lax.sort(ops, num_keys=NKEY)
    return jnp.stack(out[:NKEY]), out[NKEY:]


def _cols_eq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.all(a == b, axis=0)


@jax.jit
def append(state: IndexState, keys: jnp.ndarray, values: jnp.ndarray,
           valid: jnp.ndarray) -> IndexState:
    """Append a batch of (key, value) rows to the unsorted log as one
    contiguous slice write (no gathers/scatters — those dominate on TPU).
    Invalid rows are written as INVALID tombstones that occupy log slots
    until the next compact, so ensure_room must be called with the RAW
    batch width. n_used counts raw slots."""
    n = keys.shape[1]
    keys_w = jnp.where(valid[None, :], keys, _INVALID)
    vals_w = jnp.where(valid, values, 0)
    new_keys = jax.lax.dynamic_update_slice(
        state.keys, keys_w, (jnp.int32(0), state.n_used))
    new_data = jax.lax.dynamic_update_slice(
        state.data, vals_w, (state.n_used,))
    return IndexState(new_keys, new_data, state.n_sorted,
                      state.n_used + n)


@jax.jit
def compact(state: IndexState) -> IndexState:
    """Global sort + duplicate segment-sum: turns the whole state into one
    sorted deduped run (the TPU analog of insert_buffer's sort +
    inplace_merge, buckets.hpp:166-189)."""
    cap = state.keys.shape[1]
    in_use = jnp.arange(cap) < state.n_used
    keys = jnp.where(in_use[None, :], state.keys, _INVALID)
    data = jnp.where(in_use, state.data, 0)
    keys, (data,) = _lex_sort(keys, data)
    # Duplicate runs collapse into their first column. Invalid columns
    # (all-0xFFFFFFFF; a real bucket is < 4^15) sort to the end as one
    # trailing segment. Per-segment totals via difference of inclusive
    # prefix sums at segment boundaries (no scatter):
    #   total(seg [a,b]) = csum[b] - (csum[a] - data[a])
    first = ~_cols_eq(keys, jnp.roll(keys, 1, axis=1))
    first = first.at[0].set(True)
    valid = keys[0] != _INVALID
    # uint32 wraparound in csum is harmless: segment totals are computed
    # as differences mod 2^32, which are exact
    csum = jnp.cumsum(data, dtype=jnp.uint32)
    # propagate each segment's base to its last column via cummax (bases
    # are nondecreasing over firsts since csum is nondecreasing)
    seg_base = jax.lax.cummax(jnp.where(first, csum - data, U32(0)))
    is_last = jnp.roll(first, -1, axis=0).at[-1].set(True)
    seg_total = jnp.where(is_last, csum - seg_base, 0)
    # move each segment's total (sitting at its LAST column) to its FIRST
    # column: sort totals by segment rank of the last columns, and keys by
    # segment rank of the first columns — both orderings enumerate
    # segments 0..n_seg-1, so a single packing sort aligns them.
    n_seg_ids = jnp.cumsum(first) - 1  # segment rank per column
    big = jnp.uint32(0x7FFFFFFF)
    rank_first = jnp.where(first, n_seg_ids.astype(U32), big)
    rank_last = jnp.where(is_last, n_seg_ids.astype(U32), big)
    packed = jax.lax.sort((rank_first,) + tuple(keys[i] for i in
                                                range(NKEY)), num_keys=1)
    packed_tot = jax.lax.sort((rank_last, seg_total), num_keys=1)
    keys_u = jnp.stack(packed[1:])
    data_u = packed_tot[1]
    n_unique = jnp.sum(first & valid).astype(jnp.int32)
    keep = jnp.arange(cap) < n_unique
    keys_final = jnp.where(keep[None, :], keys_u, _INVALID)
    data_final = jnp.where(keep, data_u, 0)
    return IndexState(keys_final, data_final, n_unique, n_unique)


@jax.jit
def lookup(state: IndexState, keys: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                          jnp.ndarray]:
    """Query values for (NKEY, Q) keys against the SORTED region (callers
    compact first). Returns (found bool (Q,), values (Q,))."""
    cap = state.keys.shape[1]
    q = keys.shape[1]
    # binary search per key column over the lexicographic order
    lo = jnp.zeros((q,), dtype=jnp.int32)
    hi = jnp.broadcast_to(state.n_sorted, (q,)).astype(jnp.int32)
    steps = int(np.ceil(np.log2(max(cap, 2)))) + 1

    def key_lt(a, b):
        # a, b: (NKEY, Q). lexicographic a < b
        lt = a[0] < b[0]
        eqs = a[0] == b[0]
        for i in range(1, NKEY):
            lt = lt | (eqs & (a[i] < b[i]))
            eqs = eqs & (a[i] == b[i])
        return lt

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        mid_keys = state.keys[:, mid]
        go_right = key_lt(mid_keys, keys)
        return (jnp.where(go_right, mid + 1, lo),
                jnp.where(go_right, hi, mid))

    lo, hi = jax.lax.fori_loop(0, steps, body, (lo, hi))
    pos = jnp.clip(lo, 0, cap - 1)
    found = _cols_eq(state.keys[:, pos], keys) & (lo < state.n_sorted)
    return found, jnp.where(found, state.data[pos], 0)


def ensure_room(state: IndexState, n_incoming: int) -> IndexState:
    """Host-side: grow (double) until the log can absorb n_incoming rows."""
    cap = state.keys.shape[1]
    while int(state.n_used) + n_incoming > cap:
        cap *= 2
        state = grow(state, cap)
    return state
