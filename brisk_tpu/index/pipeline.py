"""Fused multi-batch insert pipeline.

The per-batch path (enumerate -> make_keys -> append) is three dispatches
per batch; on a remote-attached TPU the host round-trips dominate the
actual device time by ~3x. This module fuses a whole stack of batches into
ONE jitted program: a lax.scan whose carry is (IndexState, MinimizerState),
with the index buffers donated so appends update HBM in place.

This is the TPU-native analog of the reference's per-thread inner loop
(count_sequence, counter.cpp:231-270): the reference amortizes work per
OpenMP thread; we amortize per device program.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import store
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.ops.minimizer import MinimizerState


@partial(jax.jit, static_argnames=("k", "m", "b"), donate_argnums=(0,))
def insert_many(state: store.IndexState, carry: MinimizerState,
                codes: jnp.ndarray, fresh: jnp.ndarray,
                valid_end: jnp.ndarray, k: int, m: int, b: int
                ) -> Tuple[store.IndexState, MinimizerState, jnp.ndarray]:
    """Insert a stack of enumerator batches in one device program.

    codes:     (S, B, L_buf) uint32 2-bit codes
    fresh:     (S, B) bool
    valid_end: (S, B) int32

    Returns (state', carry', n_superkmers) where n_superkmers counts
    super-k-mer starts across the stack (boundary emissions plus one per
    fresh non-empty lane, mirroring api.Brisk._insert_batches).

    PRECONDITIONS (callers MUST enforce host-side; inside jit the
    dynamic_update_slice in store.append clamps out-of-bounds offsets and
    would silently overwrite the index tail):
      * capacity: state.n_used + S*B*(L_buf - (k-1)) <= cap — call
        store.ensure_room(state, S*B*L_out) (and compact first if the
        deduped size allows) before invoking.
      * donation: the input `state` buffers are DONATED (donate_argnums)
        and must not be reused by the caller after this call.
    """
    def step(sc, xs):
        st, cy = sc
        codes_i, fresh_i, ve_i = xs
        em, cy = enum_ops.enumerate_batch(codes_i, fresh_i, ve_i, cy,
                                          k=k, m=m, b=b)
        rows = store.make_keys(em.bucket.reshape(-1),
                               em.key.reshape(4, -1),
                               em.mini_idx.reshape(-1), k, b)
        valid = em.valid.reshape(-1)
        st = store.append(st, rows,
                          jnp.ones(rows.shape[1], dtype=jnp.uint32), valid)
        n_sk = (jnp.sum(em.boundary & em.valid)
                + jnp.sum(fresh_i & (ve_i > 0))).astype(jnp.int32)
        return (st, cy), n_sk

    (state, carry), n_sks = jax.lax.scan(
        step, (state, carry), (codes, fresh, valid_end))
    return state, carry, jnp.sum(n_sks)


@partial(jax.jit, static_argnames=("k", "m", "b"), donate_argnums=(0,))
def insert_windows(state: store.IndexState, codes: jnp.ndarray,
                   valid_start: jnp.ndarray, valid_end: jnp.ndarray,
                   k: int, m: int, b: int
                   ) -> Tuple[store.IndexState, jnp.ndarray, jnp.ndarray]:
    """Insert a stack of sequence-parallel WINDOW batches (io.windows) in
    one device program. Unlike insert_many there is NO carry: every lane
    is an independent window with its own warm-up replay, so the stack is
    a pure scan over the index state only.

    codes:       (S, B, L_buf) uint8/uint32 2-bit codes
    valid_start: (S, B) int32   first valid emission position per lane
    valid_end:   (S, B) int32   one past the last valid position

    Lanes whose warm-up replay failed to re-sync (no unique-window-minimum
    certificate, see io.windows) contribute NOTHING; their `cert` flag is
    returned False and the caller must re-run them exactly through the
    streaming carry path (api.Brisk._repair_windows).

    Returns (state', n_superkmer_boundaries, n_kmers, cert (S, B) bool,
    end_states MinimizerState of (S, B) leaves — the per-lane machine
    state at the end of each window buffer, exact for certified lanes and
    used to seed repairs of their successors). Callers add one super-k-mer
    per record (window 0's first boundary is suppressed by the fresh-lane
    rule) and must honor the same capacity/donation preconditions as
    insert_many (cap >= n_used + S*B*L_out; donated input state).
    """
    B = codes.shape[1]
    fresh = jnp.ones((B,), dtype=bool)
    zero = enum_ops.zero_carry(B)

    def step(st, xs):
        codes_i, vs_i, ve_i = xs
        em, end = enum_ops.enumerate_batch(codes_i, fresh, ve_i, zero,
                                           k=k, m=m, b=b, valid_start=vs_i)
        rows = store.make_keys(em.bucket.reshape(-1),
                               em.key.reshape(4, -1),
                               em.mini_idx.reshape(-1), k, b)
        valid = (em.valid & em.cert[:, None]).reshape(-1)
        st = store.append(st, rows,
                          jnp.ones(rows.shape[1], dtype=jnp.uint32), valid)
        n_sk = jnp.sum(em.boundary & em.valid & em.cert[:, None]
                       ).astype(jnp.int32)
        n_km = jnp.sum(valid).astype(jnp.int32)
        return st, (n_sk, n_km, em.cert, end)

    state, (n_sks, n_kms, certs, ends) = jax.lax.scan(
        step, state, (codes, valid_start, valid_end))
    return state, jnp.sum(n_sks), jnp.sum(n_kms), certs, ends


@partial(jax.jit, static_argnames=("k", "m", "b", "row_cap"),
         donate_argnums=(0, 1))
def insert_windows_skl(state: store.IndexState, skl: "sklstore.SklState",
                       codes: jnp.ndarray, valid_start: jnp.ndarray,
                       valid_end: jnp.ndarray, k: int, m: int, b: int,
                       row_cap: int):
    """insert_windows + compacted super-k-mer row construction (C8).

    In the same device program each batch's emissions are additionally
    segmented into super-k-mers and appended to the skl arena
    (index.sklstore) as fixed-width rows: up to `row_cap` rows per lane
    (lanes with more segments are flagged in `skl_overflow` and
    contribute NO skl rows — callers re-run them at full width through
    api.Brisk._repair_skl_overflow). Uncertified lanes contribute neither
    per-kmer rows nor skl rows (repaired exactly later).

    Returns (state', skl', n_sk, n_km, cert, ends, skl_overflow (S, B)).
    Capacity preconditions extend insert_many's: ALSO
    skl.n_rows + S*B*row_cap <= skl row capacity. Both input states are
    donated.
    """
    from brisk_tpu.index import sklstore

    S, B, L_buf = codes.shape
    margin = k - 1
    L_out = L_buf - margin
    fresh = jnp.ones((B,), dtype=bool)
    zero = enum_ops.zero_carry(B)
    pos_out = jnp.arange(margin, L_buf, dtype=jnp.uint32)[None, :]

    def step(sc, xs):
        st, sk = sc
        codes_i, vs_i, ve_i = xs
        em, end = enum_ops.enumerate_batch(codes_i, fresh, ve_i, zero,
                                           k=k, m=m, b=b, valid_start=vs_i)
        rows = store.make_keys(em.bucket.reshape(-1),
                               em.key.reshape(4, -1),
                               em.mini_idx.reshape(-1), k, b)
        ok = em.valid & em.cert[:, None]
        st = store.append(st, rows,
                          jnp.ones(rows.shape[1], dtype=jnp.uint32),
                          ok.reshape(-1))
        first_valid = pos_out == vs_i[:, None].astype(jnp.uint32)
        rb, rm, rn, ovf = sklstore.rows_from_emissions(
            em.key, em.bucket, em.mini_idx, em.use_rc, ok,
            first_valid, em.boundary, k, m, b, row_cap)
        sk = sklstore.append(sk, rb.reshape(-1), rm.reshape(-1),
                             rn.reshape(rn.shape[0], -1))
        n_sk = jnp.sum(em.boundary & ok).astype(jnp.int32)
        n_km = jnp.sum(ok).astype(jnp.int32)
        return (st, sk), (n_sk, n_km, em.cert, end, ovf)

    (state, skl), (n_sks, n_kms, certs, ends, ovfs) = jax.lax.scan(
        step, (state, skl), (codes, valid_start, valid_end))
    return state, skl, jnp.sum(n_sks), jnp.sum(n_kms), certs, ends, ovfs
