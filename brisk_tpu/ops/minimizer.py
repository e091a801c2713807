"""Per-position minimizer pipeline and the vectorized get_minimizer rescan.

The reference's get_minimizer (Kmers.cpp:367-408) is a sequential scan over
the k-m+1 m-mer windows of one k-mer. Here it is evaluated for EVERY
position at once: a static loop over window offsets i applies the literal
branch logic (strict improvement; equal-hash closer-to-edge mirror rule;
equal-distance strand rule) as vectorized selects over (..., L) arrays.

Replicated quirk (Kmers.cpp:371): the reference truncates the k-mer to its
low 64 bits before scanning, so for k > 32 the m-mer at offset i reads
((kmer & 2^64-1) >> 2i) & m_mask — windows past base 31 are partially or
fully zeroed. Offsets with 2*(i+m) <= 64 see the true m-mer (the
precomputed per-position arrays are reused); deeper offsets recompute the
masked m-mer's canonical form, decycling class and hash inline.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.oracle import pyref
from brisk_tpu.ops import codec, hashing, revcomp, u128

U32 = np.uint32  # numpy scalar: avoids device-constant embedding at trace time


class PositionArrays(NamedTuple):
    """Everything the enumerator needs, per ending position (..., L)."""
    fwd_k: u128.Limbs      # 4-limb forward k-mer
    rc_k: u128.Limbs       # 4-limb true-RC k-mer
    fwd_m: u128.Limbs      # 2-limb forward m-mer
    rc_m: u128.Limbs       # 2-limb true-RC m-mer
    canon_m: u128.Limbs    # 2-limb canonical m-mer (rolling candidate)
    cand_hash: tuple       # (heavy, hi, lo) hash of canon_m
    cand_is_rc: jnp.ndarray  # canon_m == rc_m (rolling `reversed`,
    #                          palindromes True — Kmers.cpp:576)
    scan_rev: jnp.ndarray  # canon_m != fwd_m (get_minimizer `reversed`,
    #                          palindromes False — Kmers.cpp:374)


class MinimizerState(NamedTuple):
    """get_minimizer result / enumerator minimizer state, per element."""
    mini_lo: jnp.ndarray
    mini_hi: jnp.ndarray
    pos: jnp.ndarray       # min_position (distance from the suffix end)
    rev: jnp.ndarray       # bool
    heavy: jnp.ndarray
    hash_hi: jnp.ndarray
    hash_lo: jnp.ndarray


def position_pipeline(codes: jnp.ndarray, k: int, m: int) -> PositionArrays:
    """All per-position window values + candidate hashes in one fused pass
    (replaces reference hot loop 1, SURVEY §3.1)."""
    fwd_k, rc_k, fwd_m, rc_m = codec.kmer_windows(codes, k, m)
    canon_m = u128.minimum(fwd_m, rc_m)
    cand_hash = hashing.bfc_hash(canon_m[0], canon_m[1], m)
    cand_is_rc = u128.eq(canon_m, rc_m)
    scan_rev = ~u128.eq(canon_m, fwd_m)
    return PositionArrays(fwd_k, rc_k, fwd_m, rc_m, canon_m, cand_hash,
                          cand_is_rc, scan_rev)


def _shift(x, i):
    return codec._shift_right_axis(x, i)


def _hash_of_zero(m: int):
    """Constant hash triple of the all-zero m-mer (for fully truncated
    windows at offsets 2i >= 64)."""
    h = pyref.bfc_hash_64(0, (1 << (2 * m)) - 1, pyref.DecyclingSet(m))
    heavy = h >> 62
    key = h & ((1 << 62) - 1)
    return int(heavy), int(key >> 32), int(key & 0xFFFFFFFF)


def windowed_get_minimizer(pa: PositionArrays, kmer4: u128.Limbs,
                           k_arg: int, m: int, with_unique: bool = False):
    """Vectorized literal replication of get_minimizer over every position.

    kmer4 must hold the k_arg-base window ending at each position (for the
    init variant this is the (k-1)-mer, reference Kmers.cpp:533).

    Implemented as a fori_loop over window offsets so the traced graph is
    O(1) in W = k_arg-m+1 (the unrolled form took minutes to compile for
    k=63). Clean offsets (2*(i+m) <= 64) read the precomputed per-position
    arrays via dynamic_slice; truncated offsets recompute the masked m-mer
    canon/class/hash inline inside a lax.cond branch.

    with_unique: additionally return a bool array marking positions where
    the window minimum hash is UNIQUE (exactly one window offset attains
    it). Used by the sequence-parallel window packer's re-sync certificate
    (io.windows): at a unique-minimum position the enumerator state is a
    pure function of the window content. Only meaningful for k_arg <= 32
    (no truncated offsets)."""
    W = k_arg - m + 1
    canonized = revcomp.canonized_k(kmer4, k_arg)
    heavy, hhi, hlo = pa.cand_hash
    L = heavy.shape[-1]
    pad_w = W - 1

    def padded(x):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad_w, 0)])

    shifted_src = tuple(padded(x) for x in
                        (heavy, hhi, hlo, pa.canon_m[0], pa.canon_m[1],
                         pa.scan_rev.astype(U32)))
    trunc = (kmer4[0], kmer4[1])  # uint64_t cur_seq = seq (Kmers.cpp:371)
    clean_max = (64 - 2 * m) // 2  # offsets i <= clean_max are untruncated

    def offset_clean(i):
        out = tuple(
            jax.lax.dynamic_slice_in_dim(x, pad_w - i, L, axis=-1)
            for x in shifted_src)
        return out

    def offset_corrupt(i):
        mm = u128.mask_bits(u128.shr_var(trunc, U32(2) * i.astype(U32)),
                            2 * m)
        c_lo, c_hi = revcomp.canonize64(mm[0], mm[1], m)
        h = hashing.bfc_hash(c_lo, c_hi, m)
        rev = ~((c_lo == mm[0]) & (c_hi == mm[1]))
        return h[0], h[1], h[2], c_lo, c_hi, rev.astype(U32)

    # i = 0 init (always untruncated: 2m <= 62 < 64)
    state0 = MinimizerState(
        mini_lo=pa.canon_m[0], mini_hi=pa.canon_m[1],
        pos=jnp.zeros_like(hlo), rev=pa.scan_rev,
        heavy=heavy, hash_hi=hhi, hash_lo=hlo)
    cnt0 = jnp.ones_like(hlo)  # offsets attaining the running min hash

    def body(i, carry):
        state, cnt = carry
        if clean_max >= W - 1:
            hv, hh, hl, c_lo, c_hi, rev_u = offset_clean(i)
        else:
            hv, hh, hl, c_lo, c_hi, rev_u = jax.lax.cond(
                i <= clean_max, offset_clean, offset_corrupt, i)
        rev_i = rev_u != 0
        h = (hv, hh, hl)

        cur_hash = (state.heavy, state.hash_hi, state.hash_lo)
        lt = hashing.hash_lt(h, cur_hash)
        eq = hashing.hash_eq(h, cur_hash)
        mirror = U32(W - 1) - i.astype(U32)
        take_closer = eq & (mirror < state.pos)
        take_strand = eq & (mirror == state.pos) & (~canonized)
        take_hash = lt | take_closer          # update incl. hash/rev
        take_any = take_hash | take_strand    # update mini/pos

        new_pos = jnp.where(lt, i.astype(U32), mirror)
        cnt = jnp.where(lt, U32(1), jnp.where(eq, cnt + U32(1), cnt))
        state = MinimizerState(
            mini_lo=jnp.where(take_any, c_lo, state.mini_lo),
            mini_hi=jnp.where(take_any, c_hi, state.mini_hi),
            pos=jnp.where(take_any, new_pos, state.pos),
            rev=jnp.where(take_hash, rev_i,
                          jnp.where(take_strand, False, state.rev)),
            heavy=jnp.where(take_hash, h[0], state.heavy),
            hash_hi=jnp.where(take_hash, h[1], state.hash_hi),
            hash_lo=jnp.where(take_hash, h[2], state.hash_lo))
        return state, cnt

    state, cnt = jax.lax.fori_loop(1, W, body, (state0, cnt0))
    if with_unique:
        return state, cnt == U32(1)
    return state
