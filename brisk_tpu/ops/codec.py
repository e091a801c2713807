"""2-bit DNA codec and vectorized window packing.

Encoding matches the reference (Kmers.cpp:442-450): value = (ascii >> 1) & 3
so A=0, C=1, T=2, G=3 and complement = value ^ 2.

The core trick: instead of rolling one base at a time (reference
SuperKmerEnumerator, Kmers.cpp:542-545), every k-mer / m-mer /
reverse-complement value at every position is computed in O(log) vectorized
steps via doubling packs — 16 bases per uint32 word — then composed into
multi-limb values with static shifts. This turns the reference's per-
nucleotide hot loop 1 (SURVEY §3.1) into pure data-parallel VPU work.

Position convention: arrays are (..., L) over base positions; the value at
position p describes the window ENDING at p (the last base of the k-mer is
s[p], which occupies the LOW 2 bits, matching str2num semantics).
Positions p < window-1 contain garbage and must be masked by callers.
"""

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from brisk_tpu.ops import u128

U32 = np.uint32  # numpy scalar: avoids device-constant embedding at trace time


def encode_ascii(seq_bytes: jnp.ndarray) -> jnp.ndarray:
    """uint8 ASCII -> 2-bit codes (uint32). Non-ACGT bytes produce garbage;
    callers pre-clean (host splits at N, reference counter.cpp:130-168)."""
    return (seq_bytes.astype(U32) >> U32(1)) & U32(3)


def _shift_right_axis(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """x[..., p] -> x[..., p-n], zero-filling on the left."""
    if n == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(n, 0)]
    return jnp.pad(x, pad)[..., : x.shape[-1]]


def fwd_packs16(codes: jnp.ndarray) -> jnp.ndarray:
    """w16[..., p] = sum_{u=0..15} codes[..., p-u] << 2u  (base at p in the
    LOW bits): the forward 16-base pack ending at p."""
    w = codes
    for step in (1, 2, 4, 8):
        w = (_shift_right_axis(w, step) << U32(2 * step)) | w
    return w


def rc_packs16(codes: jnp.ndarray) -> jnp.ndarray:
    """v16[..., p] = sum_{u=0..15} (codes[..., p-u]^2) << 2(15-u): the
    reverse-complement 16-base pack ending at p (complement of base p in
    the HIGH bits)."""
    v = codes ^ U32(2)
    for step in (1, 2, 4, 8):
        v = (v << U32(2 * step)) | _shift_right_axis(v, step)
    return v


def compose_fwd(w16: jnp.ndarray, n: int, n_limbs: int) -> u128.Limbs:
    """Forward n-base window value ending at each position, as limbs.

    limb j = w16[p - 16j] (then mask to 2n bits)."""
    limbs = []
    for j in range(n_limbs):
        limbs.append(_shift_right_axis(w16, 16 * j))
    return u128.mask_bits(tuple(limbs), 2 * n)


def compose_rc(v16: jnp.ndarray, n: int, n_limbs: int) -> u128.Limbs:
    """Reverse-complement n-base window value ending at each position.

    rc[p] = sum_t v16[p - 16t] << (2n - 32 - 32t): each 16-base RC pack
    deposited with the latest block at the TOP."""
    zero = jnp.zeros_like(v16)
    limbs = [zero] * n_limbs
    n_blocks = (n + 15) // 16
    for t in range(n_blocks):
        word = _shift_right_axis(v16, 16 * t)
        bitpos = 2 * n - 32 - 32 * t  # may be negative for the last block
        limbs = list(_deposit(tuple(limbs), word, bitpos))
    return u128.mask_bits(tuple(limbs), 2 * n)


def _deposit(limbs: u128.Limbs, word: jnp.ndarray, bitpos: int) -> u128.Limbs:
    """OR (word << bitpos) into a multi-limb value; bitpos may be negative
    (right shift of the word). Static bitpos."""
    n = len(limbs)
    out = list(limbs)
    if bitpos >= 0:
        w, b = divmod(bitpos, 32)
        if w < n:
            out[w] = out[w] | (word << U32(b) if b else word)
        if b and w + 1 < n:
            out[w + 1] = out[w + 1] | (word >> U32(32 - b))
    else:
        out[0] = out[0] | (word >> U32(-bitpos))
    return tuple(out)


def kmer_windows(codes: jnp.ndarray, k: int, m: int
                 ) -> Tuple[u128.Limbs, u128.Limbs, u128.Limbs, u128.Limbs]:
    """All window values in one pass over the packs.

    Returns (fwd_kmer[4], rc_kmer[4], fwd_mmer[2], rc_mmer[2]) limbs, each
    limb shaped like `codes`. Valid from position k-1 (resp. m-1) onward.
    """
    w16 = fwd_packs16(codes)
    v16 = rc_packs16(codes)
    fwd_k = compose_fwd(w16, k, 4)
    rc_k = compose_rc(v16, k, 4)
    fwd_m = compose_fwd(w16, m, 2)
    rc_m = compose_rc(v16, m, 2)
    return fwd_k, rc_k, fwd_m, rc_m
