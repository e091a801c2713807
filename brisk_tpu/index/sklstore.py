"""Compacted super-k-mer storage — the TPU-native SKL (reference
SuperKmerLight.hpp:18-122, buckets.hpp:19-58, SURVEY §2 C8).

The reference's space thesis: store each super-k-mer ONCE as
(k-b) + size - 1 nucleotides (the b bucket bases are implicit in the
bucket id) plus per-k-mer DATA — ~6 bytes of record + shared arena bytes
per super-k-mer instead of a full k-mer per row. Here the same record
becomes fixed-width array columns:

    bucket: u32          reduced-minimizer bucket id (0xFFFFFFFF = dead)
    meta:   u32          size (kmers, bits 0-7) | mini_idx (bits 8-15)
    nucs:   (NW, ) u32   compacted super-k-mer value, 2 bits/base, the
                         LAST base in the low bits (str2num convention)

where mini_idx is the REDUCED suffix length (reference kmer_mini_idx =
kmer.minimizer_idx + (m_reduc+1)/2, SuperKmerLight.hpp:99) of the LAST
k-mer, and the nucleotides live in HASHED-minimizer space exactly like
the reference's storage (hash_kmer_minimizer_inplace before insertion,
Brisk.hpp:133): k-mer j of a row (j=0 leftmost) is recovered by windowing
2*(k-b) bits at offset 2*(size-1-j) and re-inserting the 2b bucket bits
at hole offset h_j = mini_idx - (size-1-j).

Rows are built ON DEVICE during enumeration (segment assembly over
emission batches, pipeline.insert_windows_skl) and appended to a
log-structured arena; `finalize` consolidates duplicate k-mer counts
across rows by EXPANDING rows to per-k-mer packed keys (transiently),
sorting, and writing run totals back in arena order — each duplicated
k-mer keeps its count on exactly one (the first) slot, later copies
becoming zero-count dead slots. Super-k-mers split at window/batch seams
appear as separate rows (the k-mer content and counts are identical; only
the grouping differs — the reference's enumerator, scanning sequentially,
would have joined them).

Resident cost after finalize ~= (8 + 4*NW)/avg_size + 4 bytes per k-mer
(~7 B at k=31,b=8 with typical ~6-12 k-mers/super-k-mer) vs 16 B/k-mer
for the packed per-k-mer store and 28 B in round 1.
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import store
from brisk_tpu.ops import u128

U32 = np.uint32
_INVALID = U32(0xFFFFFFFF)


# Max k-mers per stored row. The enumerator's natural bound is
# 2*(k-m)+1 (41 at k=31 m=11, 85 at k=63 m=21) but the AVERAGE is ~6;
# rows are fixed-width, so a large s_max inflates both the nucleotide
# words per row (9 u32 at k=63!) and the finalize expansion/consolidate
# work (s_max/avg slots processed per real k-mer). Longer runs are SPLIT
# into several rows at build time (rows_from_emissions) — k-mer content
# and counts are unaffected, exactly like the window-seam splits the
# format already absorbs. 8 keeps nw at 2 words (k=31) / 4 words (k=63)
# and bounds slot waste at ~1.3x on typical data (50 Mb: 63M expanded
# slots for 50M k-mers vs 96M at cap 16, 330M uncapped) — the
# consolidate sort is the finalize wall, and it scales with slots.
# Power of two (the splitter masks).
SKL_SIZE_CAP = 8


def skl_dims(k: int, m: int, b: int) -> Tuple[int, int, int, int]:
    """(compacted_size, max kmers/skl, max nucleotides, nuc words)."""
    cs = k - b
    s_max = min(2 * (k - m) + 1, SKL_SIZE_CAP)
    nt_max = cs + s_max - 1
    return cs, s_max, nt_max, -(-(2 * nt_max) // 32)


class SklState(NamedTuple):
    bucket: jnp.ndarray   # (rcap,) u32
    meta: jnp.ndarray     # (rcap,) u32: size | mini_idx << 8
    nucs: jnp.ndarray     # (NW, rcap) u32
    data: jnp.ndarray     # (kcap,) u32 per-slot counts of FINALIZED rows
    offs: jnp.ndarray     # (rcap,) u32 data offset per finalized row
    n_rows: jnp.ndarray   # () i32: raw rows used (incl. dead/tombstones)
    n_fin_rows: jnp.ndarray   # () i32 rows covered by data/offs
    n_fin_kmers: jnp.ndarray  # () i32 slots covered by data


def empty(row_cap: int, kmer_cap: int, nw: int) -> SklState:
    return SklState(
        bucket=jnp.full((row_cap,), _INVALID, dtype=U32),
        meta=jnp.zeros((row_cap,), dtype=U32),
        nucs=jnp.zeros((nw, row_cap), dtype=U32),
        data=jnp.zeros((kmer_cap,), dtype=U32),
        offs=jnp.zeros((row_cap,), dtype=U32),
        n_rows=jnp.int32(0), n_fin_rows=jnp.int32(0),
        n_fin_kmers=jnp.int32(0))


def grow(state: SklState, row_cap: int, kmer_cap: int) -> SklState:
    rpad = row_cap - state.bucket.shape[0]
    kpad = kmer_cap - state.data.shape[0]
    assert rpad >= 0 and kpad >= 0
    return SklState(
        bucket=jnp.pad(state.bucket, (0, rpad),
                       constant_values=np.uint32(0xFFFFFFFF)),
        meta=jnp.pad(state.meta, (0, rpad)),
        nucs=jnp.pad(state.nucs, ((0, 0), (0, rpad))),
        data=jnp.pad(state.data, (0, kpad)),
        offs=jnp.pad(state.offs, (0, rpad)),
        n_rows=state.n_rows, n_fin_rows=state.n_fin_rows,
        n_fin_kmers=state.n_fin_kmers)


def ensure_room(state: SklState, n_rows_incoming: int) -> SklState:
    rcap = state.bucket.shape[0]
    target = rcap
    while int(state.n_rows) + n_rows_incoming > target:
        target *= 2
    if target != rcap:
        state = grow(state, target, state.data.shape[0])
    return state


@jax.jit
def append(state: SklState, bucket: jnp.ndarray, meta: jnp.ndarray,
           nucs: jnp.ndarray) -> SklState:
    """Append (N,) rows at the raw log tail. Dead rows carry
    bucket == INVALID (they occupy slots until the next finalize).
    Caller enforces capacity (ensure_room)."""
    n = bucket.shape[0]
    new_bucket = jax.lax.dynamic_update_slice(state.bucket, bucket,
                                              (state.n_rows,))
    new_meta = jax.lax.dynamic_update_slice(state.meta, meta,
                                            (state.n_rows,))
    new_nucs = jax.lax.dynamic_update_slice(state.nucs, nucs,
                                            (jnp.int32(0), state.n_rows))
    return state._replace(bucket=new_bucket, meta=new_meta, nucs=new_nucs,
                          n_rows=state.n_rows + n)


def append_n(state: SklState, bucket: jnp.ndarray, meta: jnp.ndarray,
             nucs: jnp.ndarray, n_live: jnp.ndarray) -> SklState:
    """DENSE append (device, called inside jit): write the full fixed-width
    block at the tail but advance n_rows by only the LIVE row count. The
    caller must pass the block live-rows-FIRST (dead INVALID rows sorted to
    the back), so the block's dead tail lands beyond the new n_rows and is
    overwritten by the next append — the arena stays dense (no tombstones),
    which is what kills the per-flush compress_rows sorts of round 2
    (VERDICT r2 item 1). Caller guarantees n_rows + block_width <= rcap."""
    new_bucket = jax.lax.dynamic_update_slice(state.bucket, bucket,
                                              (state.n_rows,))
    new_meta = jax.lax.dynamic_update_slice(state.meta, meta,
                                            (state.n_rows,))
    new_nucs = jax.lax.dynamic_update_slice(state.nucs, nucs,
                                            (jnp.int32(0), state.n_rows))
    return state._replace(bucket=new_bucket, meta=new_meta, nucs=new_nucs,
                          n_rows=state.n_rows + n_live)


# -- emission-batch -> skl rows (device, called inside insert pipelines) --

def _ones_mask_var(nbits: jnp.ndarray, n_limbs: int) -> u128.Limbs:
    """(1 << nbits) - 1 as limbs (variable nbits)."""
    ones = tuple(jnp.full(nbits.shape, 0xFFFFFFFF, dtype=U32)
                 for _ in range(n_limbs))
    return u128.bnot(u128.shl_var(ones, nbits))


def rows_from_emissions(key: jnp.ndarray, bucket: jnp.ndarray,
                        mini_idx: jnp.ndarray, use_rc: jnp.ndarray,
                        valid: jnp.ndarray, first_valid: jnp.ndarray,
                        boundary: jnp.ndarray, k: int, m: int, b: int,
                        row_cap: int):
    """Assemble compacted super-k-mer rows from one emission batch.

    key:       (4, B, L) hashed k-mer limbs (em.key)
    bucket, mini_idx: (B, L) u32; use_rc/valid/boundary: (B, L) bool
    first_valid: (B, L) bool — position is the lane's first valid emission
    row_cap:   max rows kept per lane (overflowing lanes are reported and
               contribute NO rows; callers re-run them at full width)

    Returns (row_bucket (B, row_cap) u32 with INVALID padding,
             row_meta (B, row_cap), row_nucs (NW, B, row_cap),
             overflow (B,) bool).

    All segment math is gather-free: positions of segment firsts/lasts
    come from monotone cummax/cummin over the lane, the variable-length
    nucleotide assembly is a SEGMENTED suffix-OR (associative_scan) over
    per-position disjoint bit contributions.
    """
    m_reduc = m - b
    suffix_reduc = (m_reduc + 1) // 2
    cs, s_max, nt_max, nw = skl_dims(k, m, b)
    B, L = bucket.shape
    key4 = u128.unstack(key)

    seg_start = valid & (boundary | first_valid)
    nxt = lambda x: jnp.pad(x[:, 1:], ((0, 0), (0, 1)))
    pos = jnp.broadcast_to(jnp.arange(L, dtype=U32)[None, :], (B, L))
    BIG = U32(0x7FFFFFFF)
    if 2 * (k - m) + 1 > s_max:
        # split runs longer than s_max into several rows (SKL_SIZE_CAP):
        # a position whose offset from its natural segment start is a
        # multiple of s_max starts a new row
        first0 = jax.lax.cummax(jnp.where(seg_start, pos, U32(0)), axis=1)
        j0 = jnp.where(valid, pos - first0, 0)
        seg_start = seg_start | (valid & ((j0 & U32(s_max - 1)) == 0))
    is_last = valid & (~nxt(valid) | nxt(seg_start))
    # nearest segment last at/after p; nearest start at/before p
    last_pos = jax.lax.cummin(jnp.where(is_last, pos, BIG), axis=1,
                              reverse=True)
    first_pos = jax.lax.cummax(jnp.where(seg_start, pos, U32(0)), axis=1)
    d = jnp.where(valid, last_pos - pos, 0)        # last - p
    j = jnp.where(valid, pos - first_pos, 0)       # p - first

    # hole offset of each kmer (reference kmer_mini_idx)
    h = mini_idx + U32(suffix_reduc)
    # compacted kmer: drop b bases at offset h
    hi_part = u128.shl_var(u128.shr_var(key4, U32(2) * (h + U32(b))),
                           U32(2) * h)
    lo_part = u128.band(key4, _ones_mask_var(U32(2) * h, 4))
    cmp4 = u128.bor(hi_part, lo_part)
    cmp4 = u128.mask_bits(cmp4, 2 * cs)

    zero = jnp.zeros((B, L), dtype=U32)
    cN = tuple(cmp4[i] if i < 4 else zero for i in range(nw))

    # disjoint per-position contributions to the segment value
    # fwd: j==0 -> full C << 2*(len-1) = 2*d ; j>0 -> (C & 3) << 2*d
    # rev: j==0 -> full C            ; j>0 -> firstbase(C) << 2*(cs-1+j)
    last_base = tuple((cN[0] & U32(3)) if i == 0 else zero
                      for i in range(nw))
    first_base_val = (cmp4[(2 * (cs - 1)) // 32] >>
                      U32((2 * (cs - 1)) % 32)) & U32(3)
    first_base = tuple(first_base_val if i == 0 else zero
                       for i in range(nw))

    fwd_contrib = u128.shl_var(
        u128.select(j == 0, cN, last_base), U32(2) * d)
    rev_contrib = u128.select(
        j == 0, cN,
        u128.shl_var(first_base, U32(2) * (U32(cs - 1) + j)))
    contrib = u128.select(use_rc, rev_contrib, fwd_contrib)
    contrib = tuple(jnp.where(valid, c, 0) for c in contrib)

    # Segmented suffix-OR: agg[p] = OR of contrib over [p, last of p's
    # segment]. Elements are functions f(x) = v | (r ? 0 : x) with
    # r = is_seg_last; composition is associative. NOTE on argument order:
    # with reverse=True, associative_scan feeds the LATER-index aggregate
    # as the FIRST argument (verified empirically), so the earlier
    # element is `bb` and its flag gates the absorption.
    def combine(a, bb):
        av, af = a
        bv, bf = bb
        v = tuple(y | jnp.where(bf, 0, x) for x, y in zip(av, bv))
        return v, af | bf

    agg, _ = jax.lax.associative_scan(
        combine, (contrib, is_last), reverse=True, axis=1)

    size = jnp.where(seg_start, d + U32(1), 0)
    mini_last = jnp.where(use_rc, h, h + d)  # max hole offset in segment
    meta = size | (mini_last << U32(8))

    # per-lane compression: segment starts to the front, in order
    n_seg = jnp.sum(seg_start, axis=1).astype(jnp.int32)
    overflow = n_seg > row_cap
    keep = seg_start & ~overflow[:, None]
    sort_key = jnp.where(keep, pos, BIG)
    row_bucket = jnp.where(keep, bucket, _INVALID)
    ops = (sort_key, row_bucket, meta) + tuple(agg)
    out = jax.lax.sort(ops, dimension=1, num_keys=1)
    row_bucket = out[1][:, :row_cap]
    row_meta = out[2][:, :row_cap]
    row_nucs = jnp.stack([o[:, :row_cap] for o in out[3:]])
    return row_bucket, row_meta, row_nucs, overflow


@jax.jit
def _compress(bucket, meta, nucs, n_fin_rows):
    """Stable-partition live rows to the front (fresh tombstones from the
    fixed-width appends go to the back). The finalized prefix contains no
    tombstones (finalize drops dead rows), so offs stay valid."""
    n = bucket.shape[0]
    tomb = bucket == _INVALID
    key = jnp.where(tomb, U32(0xFFFFFFFF), jnp.arange(n, dtype=U32))
    nw = nucs.shape[0]
    ops = (key, bucket, meta) + tuple(nucs[i] for i in range(nw))
    out = jax.lax.sort(ops, num_keys=1)
    n_live = jnp.sum(~tomb).astype(jnp.int32)
    return out[1], out[2], jnp.stack(out[3:]), n_live


def compress_rows(state: SklState) -> SklState:
    """Host wrapper: reclaim tombstone rows (pow2-prefix sort)."""
    n = int(state.n_rows)
    rcap = state.bucket.shape[0]
    n2 = min(rcap, 1 << max(10, (max(n, 1) - 1).bit_length()))
    bucket, meta, nucs, n_live = _compress(
        state.bucket[:n2], state.meta[:n2], state.nucs[:, :n2],
        state.n_fin_rows)
    new_bucket = jax.lax.dynamic_update_slice(state.bucket, bucket, (0,))
    new_meta = jax.lax.dynamic_update_slice(state.meta, meta, (0,))
    new_nucs = jax.lax.dynamic_update_slice(state.nucs, nucs,
                                            (jnp.int32(0), jnp.int32(0)))
    return state._replace(bucket=new_bucket, meta=new_meta, nucs=new_nucs,
                          n_rows=n_live)


def ensure_room_compressing(state: SklState, n_incoming: int) -> SklState:
    """compact-before-grow for the skl arena: reclaim tombstones first,
    grow only if live rows still don't fit."""
    rcap = state.bucket.shape[0]
    if int(state.n_rows) + n_incoming > rcap:
        state = compress_rows(state)
    return ensure_room(state, n_incoming)


# -- finalize: consolidate duplicate kmer counts, drop dead rows ---------

@partial(jax.jit, static_argnames=("k", "m", "b", "s_max"))
def _expand_chunk(bucket, meta, nucs, base_count,
                  k: int, m: int, b: int, s_max: int):
    """Expand (R,) rows into (R*s_max,) per-kmer packed keys + counts.

    base_count: (R, s_max) u32 counts per slot (callers gather from data
    for finalized rows; 1 for fresh rows). Returns (keys (W, R*s_max),
    cnt, valid) flattened in row-major slot order."""
    m_reduc = m - b
    suffix_reduc = (m_reduc + 1) // 2
    cs, _, _, nw = skl_dims(k, m, b)
    size = meta & U32(0xFF)
    mini = (meta >> U32(8)) & U32(0xFF)
    live = bucket != _INVALID
    zero = jnp.zeros_like(bucket)

    nucs_t = tuple(nucs[i] if i < nucs.shape[0] else zero
                   for i in range(max(nw, 4)))

    keys_all, cnt_all, val_all = [], [], []
    for jj in range(s_max):
        J = U32(jj)
        ok = live & (J < size)
        # kmer jj: window of 2*cs bits at offset 2*(size-1-jj)
        sh = U32(2) * jnp.where(ok, size - U32(1) - J, 0)
        shifted = u128.shr_var(nucs_t, sh)
        win = u128.mask_bits(tuple(shifted[:4]), 2 * cs)
        # re-insert the 2b bucket bits at hole offset h = mini-(size-1-jj)
        h = jnp.where(ok, mini - (size - U32(1) - J), 0)
        sh_h = U32(2) * h
        low = u128.band(win, _ones_mask_var(sh_h, 4))
        high = u128.shl_var(u128.shr_var(win, sh_h), sh_h + U32(2 * b))
        bucket4 = (bucket, zero, zero, zero)
        mid = u128.shl_var(bucket4, sh_h)
        kmer = u128.mask_bits(u128.bor(u128.bor(low, high), mid), 2 * k)
        full_mini_idx = jnp.where(ok, h - U32(suffix_reduc), 0)
        pk = store.make_keys(jnp.where(ok, bucket, _INVALID),
                             u128.stack(kmer), full_mini_idx, k, b)
        keys_all.append(pk)
        cnt_all.append(jnp.where(ok, base_count[:, jj], 0))
        val_all.append(ok)
    keys = jnp.stack(keys_all, axis=2).reshape(keys_all[0].shape[0], -1)
    cnt = jnp.stack(cnt_all, axis=1).reshape(-1)
    val = jnp.stack(val_all, axis=1).reshape(-1)
    return keys, cnt, val


def _expand_one_j(bucket, meta, nucs_t, J, k: int, m: int, b: int):
    """Packed keys (W, R) + live mask (R,) for k-mer index J (a TRACED
    u32 scalar — this runs as a lax.scan body) of each row. Same math as
    _expand_chunk's unrolled loop; the scan form exists because the
    unrolled graph made XLA materialize every per-J u128 intermediate:
    14.6 GB of temps at 8.4M rows (measured via memory_analysis), which
    is the whole HBM."""
    m_reduc = m - b
    suffix_reduc = (m_reduc + 1) // 2
    cs, _, _, nw = skl_dims(k, m, b)
    size = meta & U32(0xFF)
    mini = (meta >> U32(8)) & U32(0xFF)
    live = bucket != _INVALID
    zero = jnp.zeros_like(bucket)
    ok = live & (J < size)
    sh = U32(2) * jnp.where(ok, size - U32(1) - J, 0)
    shifted = u128.shr_var(nucs_t, sh)
    win = u128.mask_bits(tuple(shifted[:4]), 2 * cs)
    h = jnp.where(ok, mini - (size - U32(1) - J), 0)
    sh_h = U32(2) * h
    low = u128.band(win, _ones_mask_var(sh_h, 4))
    high = u128.shl_var(u128.shr_var(win, sh_h), sh_h + U32(2 * b))
    bucket4 = (bucket, zero, zero, zero)
    mid = u128.shl_var(bucket4, sh_h)
    kmer = u128.mask_bits(u128.bor(u128.bor(low, high), mid), 2 * k)
    full_mini_idx = jnp.where(ok, h - U32(suffix_reduc), 0)
    pk = store.make_keys(jnp.where(ok, bucket, _INVALID),
                         u128.stack(kmer), full_mini_idx, k, b)
    return pk, ok


def _nucs_tuple(bucket, nucs):
    zero = jnp.zeros_like(bucket)
    nw = nucs.shape[0]
    return tuple(nucs[i] if i < nw else zero for i in range(max(nw, 4)))


def expand_keys(state: SklState, k: int, m: int, b: int,
                chunk_rows: int = 1 << 18):
    """Expand the whole arena to per-kmer packed keys host-orchestrated in
    row chunks. Returns numpy (W, n_slots), counts (n_slots,), and the
    per-slot (row, j) ids — row-major over LIVE rows only."""
    cs, s_max, _, nw = skl_dims(k, m, b)
    n = int(state.n_rows)
    W = store.key_words(k, b)
    out_k, out_c, out_slot = [], [], []
    bucket_np = np.asarray(state.bucket)[:n]
    meta_np = np.asarray(state.meta)[:n]
    nucs_np = np.asarray(state.nucs)[:, :n]
    data_np = np.asarray(state.data)
    offs_np = np.asarray(state.offs)[:n]
    n_fin = int(state.n_fin_rows)
    for start in range(0, n, chunk_rows):
        end = min(start + chunk_rows, n)
        R = end - start
        sizes = meta_np[start:end] & 0xFF
        base_count = np.ones((R, s_max), dtype=np.uint32)
        fin = np.arange(start, end) < n_fin
        if fin.any():
            # gather finalized counts (vectorized)
            o = offs_np[start:end].astype(np.int64)
            idx = o[:, None] + np.arange(s_max)[None, :]
            idx = np.clip(idx, 0, len(data_np) - 1)
            cf = data_np[idx]
            base_count = np.where(fin[:, None], cf, base_count
                                  ).astype(np.uint32)
        keys, cnt, val = _expand_chunk(
            jnp.asarray(bucket_np[start:end]),
            jnp.asarray(meta_np[start:end]),
            jnp.asarray(nucs_np[:, start:end]),
            jnp.asarray(base_count), k=k, m=m, b=b, s_max=s_max)
        keys = np.asarray(keys)
        cnt = np.asarray(cnt)
        val = np.asarray(val)
        jslots = np.tile(np.arange(s_max, dtype=np.int64), R)
        rows = np.repeat(np.arange(start, end, dtype=np.int64), s_max)
        keep = val
        out_k.append(keys[:, keep])
        out_c.append(cnt[keep])
        out_slot.append(rows[keep] * s_max + jslots[keep])
    if not out_k:
        return (np.zeros((W, 0), np.uint32), np.zeros(0, np.uint32),
                np.zeros(0, np.int64))
    return (np.concatenate(out_k, axis=1), np.concatenate(out_c),
            np.concatenate(out_slot))


def finalize(state: SklState, k: int, m: int, b: int) -> SklState:
    """Consolidate duplicate k-mer counts, drop dead rows, group rows by
    bucket. Delegates to the device-resident pipeline (finalize_device);
    finalize_host below is the reference implementation kept for
    cross-checking in tests."""
    return finalize_device(state, k, m, b)


def finalize_host(state: SklState, k: int, m: int, b: int,
                  bucket_sort: bool = True) -> SklState:
    """Consolidate duplicate k-mer counts across rows and drop dead rows.

    Per duplicated k-mer the total lands on ONE slot (the first in
    pre-finalize arena order); later copies become zero-count slots; rows
    whose every slot is zero are dropped. Surviving rows are re-ordered
    GROUPED BY BUCKET (stable within a bucket) so lookups can slice a
    bucket's rows contiguously — the arena becomes the index's backing
    store, mirroring the reference's per-bucket SKL vectors
    (buckets.hpp:19-58). Produces a fully-finalized state (n_fin == n).

    Fully vectorized: the consolidation is one device sort over all
    expanded slots; the rebuild is numpy bincount/cumsum/fancy-index (no
    per-entry Python, VERDICT r2 weak #4)."""
    cs, s_max, nt_max, nw = skl_dims(k, m, b)
    keys, cnt, slot = expand_keys(state, k, m, b)
    n_slots = keys.shape[1]
    if n_slots == 0:
        return empty(state.bucket.shape[0], state.data.shape[0], nw)

    # sort by key (carry slot), totals at run firsts
    W = keys.shape[0]
    slot_lo = (slot & 0xFFFFFFFF).astype(np.uint32)
    slot_hi = (slot >> 32).astype(np.uint32)
    ops = tuple(jnp.asarray(keys[i]) for i in range(W)) + (
        jnp.asarray(slot_hi), jnp.asarray(slot_lo), jnp.asarray(cnt))
    out = jax.lax.sort(ops, num_keys=W + 2)  # ties broken by slot order
    skeys = out[:W]
    s_hi, s_lo, scnt = out[W], out[W + 1], out[W + 2]
    first = jnp.zeros(n_slots, dtype=bool).at[0].set(True)
    neq = jnp.zeros(n_slots, dtype=bool)
    for i in range(W):
        neq = neq | (skeys[i] != jnp.roll(skeys[i], 1))
    first = first | neq
    csum = jnp.cumsum(scnt, dtype=jnp.uint32)
    is_last = jnp.roll(first, -1).at[-1].set(True)
    last_csum = jax.lax.cummin(
        jnp.where(is_last, csum, U32(0xFFFFFFFF)), reverse=True)
    totals = jnp.where(first, last_csum - (csum - scnt), 0)
    # back to arena order
    back = jax.lax.sort((s_hi, s_lo, totals), num_keys=2)
    arena_counts = np.asarray(back[2])

    # rebuild arena: surviving rows + data + offs (host, vectorized)
    n = int(state.n_rows)
    bucket_np = np.asarray(state.bucket)[:n]
    meta_np = np.asarray(state.meta)[:n]
    nucs_np = np.asarray(state.nucs)[:, :n]
    sizes = (meta_np & 0xFF).astype(np.int64)
    live_row = bucket_np != 0xFFFFFFFF
    sizes = np.where(live_row, sizes, 0)
    # expand_keys emits slots in strictly increasing (arena) order and the
    # device sort-back restores exactly that order
    row_of_slot = slot // s_max
    # rows with any nonzero count survive
    any_live = np.bincount(row_of_slot[arena_counts > 0],
                           minlength=n).astype(bool)
    keep = live_row & any_live
    kept_rows = np.nonzero(keep)[0]
    if bucket_sort:  # group rows by bucket (stable in arena order)
        kept_rows = kept_rows[np.argsort(bucket_np[kept_rows],
                                         kind="stable")]
    new_sizes = sizes[kept_rows]
    new_offs = np.zeros(len(kept_rows), dtype=np.uint32)
    if len(kept_rows):
        new_offs[1:] = np.cumsum(new_sizes)[:-1].astype(np.uint32)
    total_k = int(new_sizes.sum())
    # per-slot gather: each kept row's live-slot run from the compact
    # arena_counts array (old start = cumsum of live sizes in OLD order)
    old_starts = np.zeros(n, dtype=np.int64)
    old_starts[1:] = np.cumsum(sizes)[:-1]
    rr = np.repeat(np.arange(len(kept_rows)), new_sizes)
    idx = (np.arange(total_k, dtype=np.int64)
           - np.repeat(new_offs.astype(np.int64), new_sizes)
           + np.repeat(old_starts[kept_rows], new_sizes))
    new_data = arena_counts[idx].astype(np.uint32)
    del rr

    rcap = state.bucket.shape[0]
    kcap = state.data.shape[0]
    while kcap < max(total_k, 1):
        kcap *= 2
    nr = len(kept_rows)
    out_bucket = np.full(rcap, 0xFFFFFFFF, dtype=np.uint32)
    out_meta = np.zeros(rcap, dtype=np.uint32)
    out_nucs = np.zeros((nucs_np.shape[0], rcap), dtype=np.uint32)
    out_offs = np.zeros(rcap, dtype=np.uint32)
    out_bucket[:nr] = bucket_np[kept_rows]
    out_meta[:nr] = meta_np[kept_rows]
    out_nucs[:, :nr] = nucs_np[:, kept_rows]
    out_offs[:nr] = new_offs
    out_data = np.zeros(kcap, dtype=np.uint32)
    out_data[:total_k] = new_data
    return SklState(
        bucket=jnp.asarray(out_bucket), meta=jnp.asarray(out_meta),
        nucs=jnp.asarray(out_nucs), data=jnp.asarray(out_data),
        offs=jnp.asarray(out_offs), n_rows=jnp.int32(nr),
        n_fin_rows=jnp.int32(nr), n_fin_kmers=jnp.int32(total_k))


# -- device-resident finalize -------------------------------------------
#
# The host-orchestrated finalize above moves the whole expansion through
# host memory; on the tunneled TPU runtime that is ~12 MB/s and dominated
# e2e (184 s of a 197 s finalize at 50 Mb). The device pipeline below
# keeps every per-slot array in HBM: the host sees only scalars. NO
# gathers/scatters anywhere (pathological on this backend): ragged joins
# are sort-merge joins, dense placements are live-first sorts + slice
# writes.




@partial(jax.jit, static_argnames=("k", "m", "b", "s_max"),
         donate_argnums=(0, 1, 2, 3))
def _expand_dense_prefix(out_keys, out_hi, out_lo, out_cnt, n_slots,
                         bucket_c, meta_c, nucs_c, data_c, f_live,
                         k: int, m: int, b: int, s_max: int):
    """Expand the FINALIZED-prefix rows to per-slot packed keys and
    DENSE-append the live slots (one live-first sort). Dense slot order
    == arena slot order, so slot t aligns with data[t]: the base count
    is read off data_c by position, no gather. Tags: (hi=0, lo=dense
    slot index t) — sorts before every tail tag in the consolidate
    back-sort. Rows at index >= f_live are fresh tail rows picked up by
    the family-padded slice and are masked dead here (the strided pass
    owns them). The per-J expansion runs as a lax.scan (see
    _expand_one_j) and fills a J-MAJOR scratch buffer; the `order` sort
    key (arena slot index r*s_max+j) restores arena-dense order, so
    buffer layout never leaks out."""
    R = bucket_c.shape[0]
    W = store.key_words(k, b)
    n = R * s_max
    nucs_t = _nucs_tuple(bucket_c, nucs_c)
    jk = jnp.full((W, n), _INVALID, dtype=U32)
    jorder = jnp.full((n,), _INVALID, dtype=U32)
    r_iota = jnp.arange(R, dtype=U32)
    row_live = r_iota < f_live.astype(U32)

    def step(carry, J):
        jk_, jo_ = carry
        keys, ok = _expand_one_j(bucket_c, meta_c, nucs_t, J, k, m, b)
        ok = ok & row_live
        keys = jnp.where(ok[None, :], keys, _INVALID)
        order = jnp.where(ok, r_iota * U32(s_max) + J, _INVALID)
        pos = (J * U32(R)).astype(jnp.int32)
        jk_ = jax.lax.dynamic_update_slice(jk_, keys, (jnp.int32(0), pos))
        jo_ = jax.lax.dynamic_update_slice(jo_, order, (pos,))
        return (jk_, jo_), jnp.sum(ok).astype(jnp.int32)

    (jk, jorder), lives = jax.lax.scan(
        step, (jk, jorder), jnp.arange(s_max, dtype=U32))
    n_live = jnp.sum(lives)
    out = jax.lax.sort((jorder,) + tuple(jk[i] for i in range(W)),
                       num_keys=1)
    live_s = out[0] != _INVALID
    keys_s = tuple(jnp.where(live_s, kk, _INVALID) for kk in out[1:1 + W])
    t = n_slots.astype(U32) + jnp.arange(n, dtype=U32)
    hi_s = jnp.where(live_s, U32(0), _INVALID)
    lo_s = jnp.where(live_s, t, _INVALID)
    cnt_s = jnp.where(live_s, data_c[:n], 0)
    out_keys = jax.lax.dynamic_update_slice(
        out_keys, jnp.stack(keys_s), (jnp.int32(0), n_slots))
    out_hi = jax.lax.dynamic_update_slice(out_hi, hi_s, (n_slots,))
    out_lo = jax.lax.dynamic_update_slice(out_lo, lo_s, (n_slots,))
    out_cnt = jax.lax.dynamic_update_slice(out_cnt, cnt_s, (n_slots,))
    return out_keys, out_hi, out_lo, out_cnt, n_slots + n_live


@partial(jax.jit, static_argnames=("k", "m", "b", "s_max"),
         donate_argnums=(0, 1, 2, 3))
def _expand_strided(out_keys, out_hi, out_lo, out_cnt,
                    bucket_c, meta_c, nucs_c, row0, write_pos,
                    k: int, m: int, b: int, s_max: int):
    """Expand FRESH rows to J-MAJOR strided slots — a lax.scan over J,
    pure elementwise per step, NO sort. Slot (r, J) lands at buffer
    offset write_pos + J*R + r with tag (hi = 1<<31 | bucket,
    lo = global_row*s_max + J); dead slots get all-ones tags. The
    consolidate back-sort orders by tag = (segment, bucket, old row, j)
    == the arena order AFTER the bucket tail sort, with dead slots last
    — the J-major buffer layout never matters."""
    R = bucket_c.shape[0]
    W = store.key_words(k, b)
    nucs_t = _nucs_tuple(bucket_c, nucs_c)
    r_iota = jnp.arange(R, dtype=U32)
    hi_base = U32(1 << 31) | bucket_c
    lo_base = (row0 + r_iota) * U32(s_max)

    def step(carry, J):
        ok_, oh_, ol_, oc_ = carry
        keys, ok = _expand_one_j(bucket_c, meta_c, nucs_t, J, k, m, b)
        keys = jnp.where(ok[None, :], keys, _INVALID)
        hi = jnp.where(ok, hi_base, _INVALID)
        lo = jnp.where(ok, lo_base + J, _INVALID)
        pos = write_pos + (J * U32(R)).astype(jnp.int32)
        ok_ = jax.lax.dynamic_update_slice(ok_, keys, (jnp.int32(0), pos))
        oh_ = jax.lax.dynamic_update_slice(oh_, hi, (pos,))
        ol_ = jax.lax.dynamic_update_slice(ol_, lo, (pos,))
        oc_ = jax.lax.dynamic_update_slice(
            oc_, ok.astype(U32), (pos,))
        return (ok_, oh_, ol_, oc_), jnp.sum(ok).astype(jnp.int32)

    (out_keys, out_hi, out_lo, out_cnt), lives = jax.lax.scan(
        step, (out_keys, out_hi, out_lo, out_cnt),
        jnp.arange(s_max, dtype=U32))
    return out_keys, out_hi, out_lo, out_cnt, jnp.sum(lives)


def _shape_family(n: int, floor: int = 1 << 12) -> int:
    """Smallest of {2^p, 3*2^(p-1)} >= n: bounds the number of distinct
    compiled shapes like pow2 sizing but wastes <= 33% instead of <= 100%
    (a pure pow2 S2 inflated the 50 Mb consolidate sort by 39%)."""
    n = max(n, floor)
    p2 = 1 << (n - 1).bit_length()
    if (3 * p2) // 4 >= n:
        return (3 * p2) // 4
    return p2


def expand_device(state: SklState, k: int, m: int, b: int,
                  chunk_rows: int = 1 << 18):
    """Whole-arena expansion, device-resident. The finalized prefix
    expands DENSE (slot t aligns with data[t], chunked); fresh tail rows
    expand STRIDED in ONE device call (no sorts, no per-chunk dispatch —
    23 chunked calls cost ~10 s of pure dispatch latency on the tunneled
    runtime). Returns (keys (W, S2) INVALID-padded, tag_hi, tag_lo, base
    counts (all (S2,)), n_slots device scalar, total_k int)."""
    cs, s_max, _, nw = skl_dims(k, m, b)
    W = store.key_words(k, b)
    F = int(state.n_fin_rows)
    N = int(state.n_rows)
    n_tail = N - F
    F_pad = _shape_family(F, floor=1 << 8) if F else 0
    R_pad = _shape_family(n_tail, floor=1 << 8) if n_tail else 0
    # SHAPE DISCIPLINE: every device op below runs on family-padded
    # shapes via dynamic_slice — an exact-n_rows slice (odd shape) would
    # compile AND load a fresh executable per value on the tunneled
    # backend (~10 s each; this was the entire "expand 10 s" mystery).
    need_cap = max(F + R_pad, F_pad, 1)
    if need_cap > state.bucket.shape[0]:
        state = grow(state, 1 << (need_cap - 1).bit_length(),
                     state.data.shape[0])
    S2 = _shape_family((F_pad + R_pad) * s_max)
    out_keys = jnp.full((W, S2), _INVALID, dtype=U32)
    out_hi = jnp.full((S2,), _INVALID, dtype=U32)
    out_lo = jnp.full((S2,), _INVALID, dtype=U32)
    out_cnt = jnp.zeros((S2,), dtype=U32)

    def rows(start, width):
        # [start, start+width) is INVALID-padded beyond n_rows by the
        # arena invariants (append_n dead tails, grow padding, tail sort)
        bucket_c = jax.lax.dynamic_slice(state.bucket, (start,), (width,))
        meta_c = jax.lax.dynamic_slice(state.meta, (start,), (width,))
        nucs_c = jax.lax.dynamic_slice(state.nucs, (0, start),
                                       (state.nucs.shape[0], width))
        return bucket_c, meta_c, nucs_c

    n_slots = jnp.int32(0)
    dense_total = strided_total = jnp.int32(0)
    if F:  # finalized prefix: dense, one live-first sort
        bucket_c, meta_c, nucs_c = rows(0, F_pad)
        need = F_pad * s_max  # one compiled shape per F_pad
        if state.data.shape[0] < need:
            dslice = jnp.pad(state.data, (0, need - state.data.shape[0]))
        else:
            dslice = state.data[:need]
        (out_keys, out_hi, out_lo, out_cnt,
         n_slots) = _expand_dense_prefix(
            out_keys, out_hi, out_lo, out_cnt, n_slots,
            bucket_c, meta_c, nucs_c, dslice, jnp.int32(F),
            k=k, m=m, b=b, s_max=s_max)
        dense_total = n_slots
    if n_tail:  # fresh tail: strided, sort-free, one call
        bucket_t, meta_t, nucs_t = rows(F, R_pad)
        (out_keys, out_hi, out_lo, out_cnt,
         strided_total) = _expand_strided(
            out_keys, out_hi, out_lo, out_cnt, bucket_t, meta_t, nucs_t,
            U32(F), jnp.int32(F_pad * s_max),
            k=k, m=m, b=b, s_max=s_max)
    total_k = int(dense_total) + int(strided_total)
    return out_keys, out_hi, out_lo, out_cnt, n_slots, total_k


@jax.jit
def _consolidate_dense(keys, tag_hi, tag_lo, cnt):
    """Sort all slots by key, land each duplicate run's total on ONE
    slot of the run, back-sort by tag. Because tags order as
    (finalized-prefix t | (1, bucket, old row, j) | dead), the
    back-sorted totals are DENSE in the arena order the bucket tail
    sort produces — dead/pad slots land at the end.

    The key sort does NOT tie-break on tags (num_keys=W, not W+2): the
    XLA sort is comparator-bound and every consumer (probe, join,
    expansion base counts, re-finalize) SUMS counts per key across
    slots, so it never matters which duplicate slot carries the run
    total."""
    W = keys.shape[0]
    S2 = tag_hi.shape[0]
    ops = tuple(keys[i] for i in range(W)) + (tag_hi, tag_lo, cnt)
    out = jax.lax.sort(ops, num_keys=W)
    skeys, s_hi, s_lo, scnt = out[:W], out[W], out[W + 1], out[W + 2]
    first = jnp.zeros(S2, dtype=bool).at[0].set(True)
    neq = jnp.zeros(S2, dtype=bool)
    for i in range(W):
        neq = neq | (skeys[i] != jnp.roll(skeys[i], 1))
    first = first | neq
    csum = jnp.cumsum(scnt, dtype=jnp.uint32)
    is_last = jnp.roll(first, -1).at[-1].set(True)
    last_csum = jax.lax.cummin(
        jnp.where(is_last, csum, U32(0xFFFFFFFF)), reverse=True)
    totals = jnp.where(first, last_csum - (csum - scnt), 0)
    back = jax.lax.sort((s_hi, s_lo, totals), num_keys=2)
    return back[2]  # (S2,) final-arena-order totals, dense


@partial(jax.jit, static_argnames=("wp",), donate_argnums=(0, 1, 2))
def _bucket_sort_tail(bucket, meta, nucs, f, wp: int):
    """Sort the unfinalized row tail [f, f+wp) by (bucket, arena order):
    groups the new rows by bucket so lookups can slice them, and pushes
    INVALID tombstones past the live tail (they are dropped by the
    caller's n_rows update). The finalized prefix [0, f) is untouched —
    its rows must keep their order because data[t] aligns with dense
    slot t of the prefix expansion (see _expand_dense_prefix)."""
    nw = nucs.shape[0]
    b_t = jax.lax.dynamic_slice(bucket, (f,), (wp,))
    m_t = jax.lax.dynamic_slice(meta, (f,), (wp,))
    n_t = jax.lax.dynamic_slice(nucs, (jnp.int32(0), f), (nw, wp))
    iota = jnp.arange(wp, dtype=U32)
    out = jax.lax.sort((b_t, iota, m_t) + tuple(n_t[i] for i in range(nw)),
                       num_keys=2)
    n_live = jnp.sum(out[0] != _INVALID).astype(jnp.int32)
    bucket = jax.lax.dynamic_update_slice(bucket, out[0], (f,))
    meta = jax.lax.dynamic_update_slice(meta, out[2], (f,))
    nucs = jax.lax.dynamic_update_slice(nucs, jnp.stack(out[3:]),
                                        (jnp.int32(0), f))
    return bucket, meta, nucs, n_live


@jax.jit
def _offs_total(bucket, meta, n_rows):
    """Per-row data offsets (exclusive cumsum of sizes over the live
    prefix) + total k-mer slot count."""
    iota = jnp.arange(bucket.shape[0], dtype=U32)
    live = (bucket != _INVALID) & (iota < n_rows.astype(U32))
    sizes = jnp.where(live, meta & U32(0xFF), 0)
    csum = jnp.cumsum(sizes, dtype=jnp.uint32)
    offs = jnp.where(live, csum - sizes, 0).astype(U32)
    return offs, (csum[-1]).astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "m", "b", "s_max", "R_pad"),
         donate_argnums=(0, 1, 2, 4))
def _finalize_fresh_fused(bucket, meta, nucs, n_rows, offs,
                          k: int, m: int, b: int, s_max: int, R_pad: int):
    """ONE device program for the dominant finalize case: the whole arena
    is fresh (f == 0 — the post-ingest finalize). Fuses what used
    to be 5 dispatches (tail sort, strided expand, consolidate sort,
    back-sort, offs) with 3 scalar readbacks in between; on the tunneled
    runtime each dispatch/readback is a ~0.1-0.2 s round-trip and the
    multi-buffer scan-carry expand copied its output buffers every step
    (measured 1.36 s for work whose HBM traffic is ~20 ms at
    speed-of-light).

    Key cost cuts vs the unfused path:
      * expand emits via lax.scan YS stacking (J-major), never a carry
        copy;
      * ONE u32 tag orders everything (row*s_max+j is the arena slot
        order after the in-program bucket sort; dead = 0xFFFFFFFF) —
        the old (hi, lo) pair moved 2 words through both sorts;
      * fresh slots all carry count 1, so the consolidate sort carries
        NO count operand (derived from tag != INVALID);
      * counts stay at S2 width (no total_k-shaped slice program).

    Returns (bucket', meta', nucs', offs', data (S2,), n_live_rows,
    total_k). Rows beyond R_pad are untouched (caller guarantees
    n_rows <= R_pad <= rcap)."""
    W = store.key_words(k, b)
    nw = nucs.shape[0]
    S2 = R_pad * s_max
    iota = jnp.arange(R_pad, dtype=U32)
    in_rows = iota < n_rows.astype(U32)

    # 1) bucket-group the rows (stable in arena order); INVALID rows last
    b_t = jax.lax.dynamic_slice(bucket, (jnp.int32(0),), (R_pad,))
    m_t = jax.lax.dynamic_slice(meta, (jnp.int32(0),), (R_pad,))
    n_t = jax.lax.dynamic_slice(nucs, (jnp.int32(0), jnp.int32(0)),
                                (nw, R_pad))
    b_t = jnp.where(in_rows, b_t, _INVALID)
    srt = jax.lax.sort((b_t, iota, m_t) + tuple(n_t[i] for i in range(nw)),
                       num_keys=2)
    sb, sm = srt[0], srt[2]
    sn = jnp.stack(srt[3:])
    n_live = jnp.sum(sb != _INVALID).astype(jnp.int32)

    # 2) expand each row's k-mers to packed keys, J-major via scan ys
    nucs_t = _nucs_tuple(sb, sn)

    def step(_, J):
        keys, ok = _expand_one_j(sb, sm, nucs_t, J, k, m, b)
        keys = jnp.where(ok[None, :], keys, _INVALID)
        tag = jnp.where(ok, iota * U32(s_max) + J, _INVALID)
        return None, (keys, tag)

    _, (jk, jtag) = jax.lax.scan(step, None,
                                 jnp.arange(s_max, dtype=U32))
    keys = jnp.moveaxis(jk, 0, 1).reshape(W, S2)   # (W, S2) J-major
    tag = jtag.reshape(S2)

    # 3) consolidate: sort by key (tag rides along), run totals on one
    # slot per run, back-sort by tag -> arena slot order
    out = jax.lax.sort(tuple(keys[i] for i in range(W)) + (tag,),
                       num_keys=W)
    s_tag = out[W]
    live_s = s_tag != _INVALID
    first = jnp.zeros(S2, dtype=bool).at[0].set(True)
    neq = jnp.zeros(S2, dtype=bool)
    for i in range(W):
        neq = neq | (out[i] != jnp.roll(out[i], 1))
    first = first | neq
    cnt = live_s.astype(U32)
    csum = jnp.cumsum(cnt, dtype=jnp.uint32)
    is_last = jnp.roll(first, -1).at[-1].set(True)
    last_csum = jax.lax.cummin(
        jnp.where(is_last, csum, U32(0xFFFFFFFF)), reverse=True)
    totals = jnp.where(first & live_s, last_csum - (csum - cnt), 0)
    back = jax.lax.sort((s_tag, totals), num_keys=1)
    data = back[1]

    # 4) offs + total over the sorted live prefix
    sizes = jnp.where(sb != _INVALID, sm & U32(0xFF), 0)
    csz = jnp.cumsum(sizes, dtype=jnp.uint32)
    offs_new = jnp.where(sb != _INVALID, csz - sizes, 0).astype(U32)
    total_k = csz[-1].astype(jnp.int32)

    # 5) write the sorted rows back into the donated arena prefix
    z = jnp.int32(0)
    bucket = jax.lax.dynamic_update_slice(bucket, sb, (z,))
    meta = jax.lax.dynamic_update_slice(meta, sm, (z,))
    nucs = jax.lax.dynamic_update_slice(nucs, sn, (z, z))
    offs = jax.lax.dynamic_update_slice(offs, offs_new, (z,))
    return bucket, meta, nucs, offs, data, n_live, total_k


def finalize_device(state: SklState, k: int, m: int, b: int) -> SklState:
    """Device-resident finalize: consolidate duplicate k-mer counts,
    bucket-group the fresh row tail — everything in HBM; the host reads
    only scalars (the transfer-bound host finalize above moved ~2 GB
    over a ~12 MB/s tunnel).

    Round-4 redesign: rows are bucket-sorted BEFORE expansion (the fresh
    tail only), so after consolidation data[t] is simply the dense-slot
    totals in arena order — no post-hoc row/slot permutation. The round-3
    `_rebuild_rows` mega-program (three (rcap+S2)-wide merge-join sorts)
    made the remote TPU compiler OOM at 50 Mb scale and is gone. Each
    finalize leaves the arena as a sequence of bucket-grouped SEGMENTS
    ([0, prior n_fin) segments + the newly sorted tail); lookups probe
    each segment (api tracks the boundaries — reference analog: the
    sorted-prefix/unsorted-tail split per bucket, buckets.hpp:166-189).
    Rows whose every slot consolidated to zero are NOT dropped (they
    cost arena space until a full rebuild; correctness is unaffected —
    zero-count slots add nothing to probes)."""
    cs, s_max, nt_max, nw = skl_dims(k, m, b)
    F, N = int(state.n_fin_rows), int(state.n_rows)
    if N == 0:
        return empty(state.bucket.shape[0], state.data.shape[0], nw)
    if N == F:
        return state  # fully finalized already (idempotent)
    if F == 0:
        # post-ingest finalize: the whole arena is fresh — ONE fused
        # device program (round 5; the 5-dispatch path below cost ~3x
        # its device time in tunnel round-trips and scan-carry copies)
        R_pad = _shape_family(N, floor=1 << 10)
        assert (R_pad * s_max) < (1 << 32) - 1, "tag32 overflow"
        if R_pad > state.bucket.shape[0]:
            state = grow(state, 1 << (R_pad - 1).bit_length(),
                         state.data.shape[0])
        bucket, meta, nucs, offs, data, n_live, total_k = \
            _finalize_fresh_fused(state.bucket, state.meta, state.nucs,
                                  jnp.int32(N), state.offs,
                                  k=k, m=m, b=b, s_max=s_max, R_pad=R_pad)
        nl, tk = jax.device_get((n_live, total_k))
        return SklState(bucket=bucket, meta=meta, nucs=nucs, data=data,
                        offs=offs, n_rows=jnp.int32(int(nl)),
                        n_fin_rows=jnp.int32(int(nl)),
                        n_fin_kmers=jnp.int32(int(tk)))
    wp = 1 << max(10, (N - F - 1).bit_length())
    if F + wp > state.bucket.shape[0]:
        state = grow(state, 1 << (F + wp - 1).bit_length(),
                     state.data.shape[0])
    bucket, meta, nucs, n_live_t = _bucket_sort_tail(
        state.bucket, state.meta, state.nucs, jnp.int32(F), wp=wp)
    N = F + int(n_live_t)
    state = state._replace(bucket=bucket, meta=meta, nucs=nucs,
                           n_rows=jnp.int32(N))
    keys, tag_hi, tag_lo, counts, n_slots, total_ub = expand_device(
        state, k, m, b)
    arena_counts = _consolidate_dense(keys, tag_hi, tag_lo, counts)
    offs, total_k = _offs_total(state.bucket, state.meta, state.n_rows)
    tk = int(total_k)
    kcap = _shape_family(tk, floor=1 << 14)
    data = arena_counts
    if kcap <= data.shape[0]:
        data = jax.lax.dynamic_slice(data, (0,), (kcap,))
    else:
        data = jnp.pad(data, (0, kcap - data.shape[0]))
    return state._replace(data=data, offs=offs,
                          n_fin_rows=jnp.int32(N),
                          n_fin_kmers=jnp.int32(tk))


# -- serving lookups from the finalized arena (C8 as the backing store) --

def expanded_state(state: SklState, k: int, m: int, b: int):
    """TRANSIENT per-k-mer sorted view of the (finalized) arena for batch
    queries: expand every slot to its packed key + count (device-resident,
    expand_device), sort and consolidate into a store.IndexState that
    store.lookup can binary search. This is working memory for the
    duration of a query batch, not resident index state (the resident
    index is the arena itself — ~(8+4*nw)/avg_size + 4 bytes per
    k-mer)."""
    keys, tag_hi, tag_lo, counts, n_slots, total_k = expand_device(
        state, k, m, b)
    st = store.IndexState(keys=keys, data=counts,
                          n_sorted=jnp.int32(0),
                          n_used=n_slots)
    return store.compact_fast(st)


def fetch_rows(arr: jnp.ndarray, start: int, n: int) -> np.ndarray:
    """Transfer arr[start:start+n] (last axis) to host through a
    family-shaped dynamic_slice window: exact-length slices compile AND
    load a fresh executable per distinct length on the tunneled backend
    (~10 s each). The window start is shifted down when it would overrun
    the array (dynamic_slice clamps); the overhang is trimmed on host."""
    size = arr.shape[-1]
    if n <= 0:
        return np.zeros(arr.shape[:-1] + (0,), dtype=arr.dtype)
    width = min(_shape_family(n, floor=1 << 4), size)
    lo = min(start, size - width)
    off = start - lo
    starts = (0,) * (arr.ndim - 1) + (lo,)
    sizes = arr.shape[:-1] + (width,)
    return np.asarray(
        jax.lax.dynamic_slice(arr, starts, sizes))[..., off:off + n]


def bucket_slice(state: SklState, bucket_id: int, segments=None,
                 bucket_col: np.ndarray = None):
    """Row ranges of one bucket across the arena's bucket-grouped
    segments (host binary search on the bucket column). `segments` is the
    list of (lo, hi) row ranges each individually bucket-sorted (one per
    finalize — the reference analog of the sorted-prefix/unsorted-tail
    split, buckets.hpp:166-189); None means one segment covering all
    finalized rows. `bucket_col` is an optional HOST cache of the bucket
    column — without it every call pays a device->host transfer of the
    whole column (~2.5 s at 50 Mb scale on the tunneled backend)."""
    n = int(state.n_fin_rows)
    if segments is None:
        segments = [(0, n)]
    if bucket_col is None:
        bucket_col = fetch_rows(state.bucket, 0, n)
    out = []
    for lo, hi in segments:
        seg = bucket_col[lo:hi]
        l = lo + int(np.searchsorted(seg, bucket_id, side="left"))
        h = lo + int(np.searchsorted(seg, bucket_id, side="right"))
        if h > l:
            out.append((l, h))
    return out


def probe(state: SklState, packed_cols: np.ndarray, bucket_id: int,
          k: int, m: int, b: int, segments=None,
          bucket_col: np.ndarray = None):
    """Count lookup for a handful of packed keys known to live in one
    bucket: expand just that bucket's rows (across all segments) and sum
    counts of matching slots (the reference's find_kmer bounded scan,
    buckets.hpp:499-519, recast as a tiny dense expand+compare).
    Duplicate slots beyond the first hold zero counts, so summing across
    segments is exact. Returns (found (Q,) bool, counts (Q,) u32)."""
    cs, s_max, _, nw = skl_dims(k, m, b)
    ranges = bucket_slice(state, bucket_id, segments, bucket_col)
    Q = packed_cols.shape[1]
    found = np.zeros(Q, bool)
    counts = np.zeros(Q, np.uint64)
    for lo, hi in ranges:
        R = hi - lo
        Rp = 1 << max(4, (R - 1).bit_length())  # pad: reuse compiled shapes
        bucket_np = np.full(Rp, 0xFFFFFFFF, np.uint32)
        meta_np = np.zeros(Rp, np.uint32)
        nucs_np = np.zeros((state.nucs.shape[0], Rp), np.uint32)
        bucket_np[:R] = fetch_rows(state.bucket, lo, R)
        meta_np[:R] = fetch_rows(state.meta, lo, R)
        nucs_np[:, :R] = fetch_rows(state.nucs, lo, R)
        offs = fetch_rows(state.offs, lo, R).astype(np.int64)
        # rows of a segment are contiguous in data: transfer just that span
        d_lo = int(offs[0])
        d_n = min(int(offs[-1]) + s_max, state.data.shape[0]) - d_lo
        dslice = fetch_rows(state.data, d_lo, d_n)
        idx = np.clip(offs[:, None] + np.arange(s_max)[None, :] - d_lo, 0,
                      max(len(dslice) - 1, 1))
        base_count = np.zeros((Rp, s_max), np.uint32)
        base_count[:R] = dslice[idx]
        keys, cnt, val = _expand_chunk(
            jnp.asarray(bucket_np), jnp.asarray(meta_np),
            jnp.asarray(nucs_np), jnp.asarray(base_count),
            k=k, m=m, b=b, s_max=s_max)
        keys = np.asarray(keys)
        cnt = np.asarray(cnt)
        val = np.asarray(val)
        W = keys.shape[0]
        eq = np.ones((Q, keys.shape[1]), bool)
        for i in range(W):
            eq &= keys[i][None, :] == packed_cols[i][:, None]
        eq &= val[None, :]
        found |= eq.any(axis=1)
        counts += (eq * cnt[None, :].astype(np.uint64)).sum(axis=1)
    return found, counts.astype(np.uint32)


@partial(jax.jit, static_argnames=("k", "m", "b", "s_max"))
def _expand_join_dense(bucket_c, meta_c, nucs_c, data_c, f_live,
                       k: int, m: int, b: int, s_max: int):
    """(keys, cnt) of a FINALIZED arena for the query join — like
    _expand_dense_prefix but without tags (the join never looks at slot
    order). Scan over J (see _expand_one_j) + one live-first sort to
    align counts with data positions."""
    R = bucket_c.shape[0]
    W = store.key_words(k, b)
    n = R * s_max
    nucs_t = _nucs_tuple(bucket_c, nucs_c)
    jk = jnp.full((W, n), _INVALID, dtype=U32)
    jorder = jnp.full((n,), _INVALID, dtype=U32)
    r_iota = jnp.arange(R, dtype=U32)
    row_live = r_iota < f_live.astype(U32)

    def step(carry, J):
        jk_, jo_ = carry
        keys, ok = _expand_one_j(bucket_c, meta_c, nucs_t, J, k, m, b)
        ok = ok & row_live
        keys = jnp.where(ok[None, :], keys, _INVALID)
        order = jnp.where(ok, r_iota * U32(s_max) + J, _INVALID)
        pos = (J * U32(R)).astype(jnp.int32)
        jk_ = jax.lax.dynamic_update_slice(jk_, keys, (jnp.int32(0), pos))
        jo_ = jax.lax.dynamic_update_slice(jo_, order, (pos,))
        return (jk_, jo_), None

    (jk, jorder), _ = jax.lax.scan(step, (jk, jorder),
                                   jnp.arange(s_max, dtype=U32))
    out = jax.lax.sort((jorder,) + tuple(jk[i] for i in range(W)),
                       num_keys=1)
    live_s = out[0] != _INVALID
    keys_s = jnp.stack([jnp.where(live_s, kk, _INVALID)
                        for kk in out[1:1 + W]])
    cnt_s = jnp.where(live_s, data_c[:n], 0)
    return keys_s, cnt_s


@partial(jax.jit, static_argnames=("k", "m", "b", "s_max"))
def _expand_join_strided(bucket_c, meta_c, nucs_c,
                         k: int, m: int, b: int, s_max: int):
    """(keys, live) of a FRESH arena for the query join — scan over J,
    J-major, no sort, no tags."""
    R = bucket_c.shape[0]
    W = store.key_words(k, b)
    n = R * s_max
    nucs_t = _nucs_tuple(bucket_c, nucs_c)
    jk = jnp.full((W, n), _INVALID, dtype=U32)
    jc = jnp.zeros((n,), dtype=U32)

    def step(carry, J):
        jk_, jc_ = carry
        keys, ok = _expand_one_j(bucket_c, meta_c, nucs_t, J, k, m, b)
        keys = jnp.where(ok[None, :], keys, _INVALID)
        pos = (J * U32(R)).astype(jnp.int32)
        jk_ = jax.lax.dynamic_update_slice(jk_, keys, (jnp.int32(0), pos))
        jc_ = jax.lax.dynamic_update_slice(jc_, ok.astype(U32), (pos,))
        return (jk_, jc_), None

    (jk, jc), _ = jax.lax.scan(step, (jk, jc),
                               jnp.arange(s_max, dtype=U32))
    return jk, jc


def expand_for_join(state: SklState, k: int, m: int, b: int):
    """(keys (W, S), counts (S,)) of an arena for the query join. The
    arena must be fully finalized (counts = consolidated data) or fully
    fresh (counts = 1 per live slot)."""
    cs, s_max, _, nw = skl_dims(k, m, b)
    F = int(state.n_fin_rows)
    N = int(state.n_rows)
    R_pad = _shape_family(max(N, 1), floor=1 << 8)
    if R_pad > state.bucket.shape[0]:
        state = grow(state, 1 << (R_pad - 1).bit_length(),
                     state.data.shape[0])

    def rows(width):
        bucket_c = jax.lax.dynamic_slice(state.bucket, (0,), (width,))
        meta_c = jax.lax.dynamic_slice(state.meta, (0,), (width,))
        nucs_c = jax.lax.dynamic_slice(state.nucs, (0, 0),
                                       (state.nucs.shape[0], width))
        return bucket_c, meta_c, nucs_c

    bucket_c, meta_c, nucs_c = rows(R_pad)
    if F == N:  # finalized index
        need = R_pad * s_max
        if state.data.shape[0] < need:
            dslice = jnp.pad(state.data, (0, need - state.data.shape[0]))
        else:
            dslice = state.data[:need]
        return _expand_join_dense(bucket_c, meta_c, nucs_c, dslice,
                                  jnp.int32(F), k=k, m=m, b=b,
                                  s_max=s_max)
    assert F == 0, "join expansion needs a fully fresh or finalized arena"
    return _expand_join_strided(bucket_c, meta_c, nucs_c,
                                k=k, m=m, b=b, s_max=s_max)


@jax.jit
def _query_join_partials(ikeys, icnt, qkeys, qlive):
    """Sum of index counts over a batch of query slots via ONE
    sort-merge join (the binary-search lookup was a 27-step gather per
    batch — pathological on TPU). Sort puts every index slot (tag 0)
    before the query slots (tag 1) of the same key; a segmented cumsum
    of index counts then hands each query slot its key's total (the
    consolidation invariant makes per-key index sums exact even with
    zero-count duplicate slots). Returns (256,) u32 partial sums of
    (count mod 256) per query emission — host sums them as python ints
    (a single u32/f32 accumulator would overflow/lose precision at
    ~50M x 255)."""
    W = ikeys.shape[0]
    Si = ikeys.shape[1]
    Sq = qkeys.shape[1]
    S = Si + Sq
    keys = tuple(jnp.concatenate([ikeys[i], qkeys[i]]) for i in range(W))
    tag = jnp.concatenate([jnp.zeros(Si, U32), jnp.ones(Sq, U32)])
    cnt = jnp.concatenate([icnt, jnp.zeros(Sq, U32)])
    livq = jnp.concatenate([jnp.zeros(Si, U32), qlive.astype(U32)])
    out = jax.lax.sort(keys + (tag, cnt, livq), num_keys=W + 1)
    s_tag, s_cnt, s_liv = out[W], out[W + 1], out[W + 2]
    first = jnp.zeros(S, dtype=bool).at[0].set(True)
    neq = jnp.zeros(S, dtype=bool)
    for i in range(W):
        neq = neq | (out[i] != jnp.roll(out[i], 1))
    first = first | neq
    contrib = jnp.where(s_tag == 0, s_cnt, 0)
    c = jnp.cumsum(contrib, dtype=jnp.uint32)
    # csum at each run's start, propagated forward (csum is monotone,
    # so a cummax of run-start snapshots is exactly the forward fill)
    base = jax.lax.cummax(jnp.where(first, c - contrib, 0))
    filled = c - base
    vals = jnp.where((s_tag == 1) & (s_liv == 1), filled % U32(256), 0)
    # two-level sum: (256, S/256) row sums stay under 2^32
    Xp = 256
    pad = (-S) % Xp
    vals = jnp.pad(vals, (0, pad)).reshape(Xp, -1)
    return jnp.sum(vals, axis=1, dtype=jnp.uint32)


def query_join_total(state: SklState, qstate_box: list,
                     k: int, m: int, b: int) -> int:
    """Total stored count over every k-mer emission of a QUERY arena
    (un-finalized: each emission is one cnt=1 slot) against a FINALIZED
    index arena. Both sides expand device-resident; the join is chunked
    over the query slots to bound peak HBM (16 GB on a v5e chip: index
    arena + both expansions + one join chunk's sort workspace).

    qstate_box: single-element list holding the query SklState — the
    callee takes OWNERSHIP (pops and frees the ~1 GB row arena right
    after its expansion; a plain argument would stay pinned by the
    caller's frame)."""
    # ORDER MATTERS for peak HBM (16 GB): expand the index while the
    # query side holds only its row arena, trim the index expansion to
    # its dense live prefix and FREE the untrimmed buffers, THEN expand
    # the query side.
    ik0, icnt0 = expand_for_join(state, k, m, b)
    Si = _shape_family(int(state.n_fin_kmers))
    if Si < ik0.shape[1]:
        ik = ik0[:, :Si]
        icnt = icnt0[:Si]
    else:
        ik, icnt = ik0, icnt0
    del ik0, icnt0
    qstate = qstate_box.pop()
    qk, qcnt = expand_for_join(qstate, k, m, b)
    del qstate
    Sq = qk.shape[1]
    CQ = min(Sq, 1 << 25)
    total = 0
    for start in range(0, Sq, CQ):
        qc = qk[:, start:start + CQ]
        ql = qcnt[start:start + CQ]
        pad = CQ - qc.shape[1]
        if pad:  # keep one compiled shape per (Si, CQ)
            qc = jnp.pad(qc, ((0, 0), (0, pad)),
                         constant_values=np.uint32(0xFFFFFFFF))
            ql = jnp.pad(ql, (0, pad))
        part = _query_join_partials(ik, icnt, qc, ql)
        total += int(np.asarray(part, dtype=np.uint64).sum())
    return total


def query_join_keys_total(state: SklState, qk, qlive,
                          k: int, m: int, b: int,
                          chunk: int = 1 << 25) -> int:
    """Total stored count over a batch of query PACKED KEYS against a
    FINALIZED arena — the shadow-index-free query path (VERDICT r4
    item 6): the caller enumerates the query file straight to packed
    keys; no second arena is built. qk (W, Sq) u32, qlive (Sq,)
    u32/bool. Chunked over the query slots to bound peak HBM."""
    ik0, icnt0 = expand_for_join(state, k, m, b)
    Si = _shape_family(int(state.n_fin_kmers))
    if Si < ik0.shape[1]:
        ik = ik0[:, :Si]
        icnt = icnt0[:Si]
    else:
        ik, icnt = ik0, icnt0
    del ik0, icnt0
    Sq = qk.shape[1]
    CQ = min(_shape_family(max(Sq, 1)), chunk)
    total = 0
    for start in range(0, Sq, CQ):
        qc = jnp.asarray(qk[:, start:start + CQ])
        ql = jnp.asarray(qlive[start:start + CQ]).astype(U32)
        pad = CQ - qc.shape[1]
        if pad:  # keep one compiled shape per (Si, CQ)
            qc = jnp.pad(qc, ((0, 0), (0, pad)),
                         constant_values=np.uint32(0xFFFFFFFF))
            ql = jnp.pad(ql, (0, pad))
        part = _query_join_partials(ik, icnt, qc, ql)
        total += int(np.asarray(part, dtype=np.uint64).sum())
    return total


@partial(jax.jit, static_argnames=("k", "m", "b"))
def _rows_from_keys(keys: jnp.ndarray, k: int, m: int, b: int):
    """Packed per-kmer keys (W, N) -> size-1 skl rows (bucket, meta,
    nucs)."""
    m_reduc = m - b
    suffix_reduc = (m_reduc + 1) // 2
    cs, _, _, nw = skl_dims(k, m, b)
    W = keys.shape[0]
    le = tuple(keys[W - 1 - i] for i in range(W))
    mini_full = le[0] & U32(0xFF)
    kmer_all = u128.shr(le, 8)
    zero = jnp.zeros_like(le[0])
    kmer4 = u128.mask_bits(tuple(kmer_all[i] if i < len(kmer_all) else zero
                                 for i in range(4)), 2 * k)
    bucket_limbs = u128.shr(le, 8 + 2 * k)
    bucket = bucket_limbs[0] & U32((1 << (2 * b)) - 1)

    h = mini_full + U32(suffix_reduc)
    sh_h = U32(2) * h
    hi_part = u128.shl_var(u128.shr_var(kmer4, sh_h + U32(2 * b)), sh_h)
    lo_part = u128.band(kmer4, _ones_mask_var(sh_h, 4))
    cmp4 = u128.mask_bits(u128.bor(hi_part, lo_part), 2 * cs)
    nucs = jnp.stack([cmp4[i] if i < 4 else zero for i in range(nw)])
    meta = U32(1) | (h << U32(8))
    return bucket, meta, nucs


def from_entries(state, k: int, m: int, b: int,
                 chunk: int = 1 << 20) -> SklState:
    """Rebuild a (finalized) arena of size-1 rows from a compacted
    per-kmer IndexState — used after reallocate, where the new minimizer
    decomposition invalidates old super-k-mer groupings (the reference's
    reallocate likewise re-inserts k-mer by k-mer, Brisk.hpp:210-219)."""
    cs, s_max, nt_max, nw = skl_dims(k, m, b)
    n = int(state.n_sorted)
    keys_np = np.asarray(state.keys)[:, :n]
    counts_np = np.asarray(state.data)[:n]
    live = counts_np != 0
    keys_np = keys_np[:, live]
    counts_np = counts_np[live]
    n_live = keys_np.shape[1]
    rcap = max(1024, 1 << max(0, (max(n_live, 1) - 1).bit_length()))
    out_b = np.full(rcap, 0xFFFFFFFF, dtype=np.uint32)
    out_m = np.zeros(rcap, dtype=np.uint32)
    out_n = np.zeros((nw, rcap), dtype=np.uint32)
    for start in range(0, n_live, chunk):
        end = min(start + chunk, n_live)
        bb, mm, nn = _rows_from_keys(jnp.asarray(keys_np[:, start:end]),
                                     k=k, m=m, b=b)
        out_b[start:end] = np.asarray(bb)
        out_m[start:end] = np.asarray(mm)
        out_n[:, start:end] = np.asarray(nn)
    kcap = max(1024, rcap)
    data = np.zeros(kcap, dtype=np.uint32)
    data[:n_live] = counts_np
    offs = np.zeros(rcap, dtype=np.uint32)
    offs[:n_live] = np.arange(n_live, dtype=np.uint32)
    return SklState(
        bucket=jnp.asarray(out_b), meta=jnp.asarray(out_m),
        nucs=jnp.asarray(out_n), data=jnp.asarray(data),
        offs=jnp.asarray(offs), n_rows=jnp.int32(n_live),
        n_fin_rows=jnp.int32(n_live), n_fin_kmers=jnp.int32(n_live))


@jax.jit
def _count_nonzero_prefix(data: jnp.ndarray, n: jnp.ndarray):
    iota = jnp.arange(data.shape[0], dtype=jnp.int32)
    return jnp.sum((iota < n) & (data != 0), dtype=jnp.int32)


def stats(state: SklState) -> dict:
    n = int(state.n_fin_rows)
    nk = int(state.n_fin_kmers)
    nw = state.nucs.shape[0]
    live_counts = int(_count_nonzero_prefix(state.data, jnp.int32(nk)))
    resident = (8 + 4 * nw) * max(n, 1) + nk  # u8 counts on disk/resident
    return dict(nb_superkmer_rows=n, nb_slots=nk,
                nb_live_kmers=live_counts,
                avg_kmers_per_skl=(nk / n) if n else 0.0,
                resident_bytes=resident,
                bytes_per_kmer=(resident / live_counts) if live_counts
                else 0.0)
