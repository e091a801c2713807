"""Host-side index enumeration: reconstruct original k-mers from stored
hashed keys (the TPU analog of Brisk::next + unhash, Brisk.hpp:166-172).

Stored entry key = (bucket, hashed_kmer[4 limbs], mini_idx). The original
k-mer is recovered by un-hashing the 2m-bit slice at mini_idx with the
inverse mixer (hashing.cpp:23-49) — 64-bit multiplies, done here in
vectorized numpy (device never needs the inverse).
"""

from typing import Iterator, Tuple

import numpy as np

from brisk_tpu.index import store
from brisk_tpu.params import Parameters

_U64 = np.uint64((1 << 64) - 1)


def bfc_hash_inv_np(key: np.ndarray, mask: int) -> np.ndarray:
    """Vectorized inverse of the reference mixer on uint64 arrays."""
    with np.errstate(over="ignore"):
        key = key.astype(np.uint64)
        m = np.uint64(mask)
        tmp = key - (key << np.uint64(31))
        key = (key - (tmp << np.uint64(31))) & m
        tmp = key ^ (key >> np.uint64(28))
        key = key ^ (tmp >> np.uint64(28))
        key = (key * np.uint64(14933078535860113213)) & m
        tmp = key ^ (key >> np.uint64(14))
        tmp = key ^ (tmp >> np.uint64(14))
        tmp = key ^ (tmp >> np.uint64(14))
        key = key ^ (tmp >> np.uint64(14))
        key = (key * np.uint64(15244667743933553977)) & m
        tmp = key ^ (key >> np.uint64(24))
        key = key ^ (tmp >> np.uint64(24))
        tmp = ~key
        tmp = ~(key - (tmp << np.uint64(21)))
        tmp = ~(key - (tmp << np.uint64(21)))
        key = (~(key - (tmp << np.uint64(21)))) & m
        return key


def entries(state: store.IndexState, params: Parameters
            ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (kmers_obj, counts, buckets): kmers as an object array of
    Python ints (original un-hashed values), counts as uint32.

    Requires a compacted state (n_used == n_sorted)."""
    n = int(state.n_sorted)
    keys = np.asarray(state.keys)[:, :n]
    counts = np.asarray(state.data)[:n]
    bucket = keys[0]
    mini_idx = keys[5].astype(np.uint64)
    # compose the hashed k-mer as object ints (2k <= 126 bits)
    hashed = (keys[1].astype(object) << 96) | (keys[2].astype(object) << 64) \
        | (keys[3].astype(object) << 32) | keys[4].astype(object)
    m_mask = params.m_mask
    shift = 2 * mini_idx.astype(object)
    slices = (hashed >> shift) & m_mask
    unhashed_slice = bfc_hash_inv_np(
        np.array([int(s) for s in slices], dtype=np.uint64), m_mask)
    hole = np.array([m_mask << int(s) for s in shift], dtype=object)
    kmers = (hashed & ~hole) | \
        (unhashed_slice.astype(object) << shift)
    return kmers, counts, bucket
