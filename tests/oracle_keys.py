"""Pure-Python packed-key-level ground truth.

Replaces the removed round-1/2 packed per-k-mer backend
(Brisk(keep_superkmers=False)) as the tests' key-level oracle: per
emission, the k-mer is keyed exactly like api.Brisk.get —
hashed-minimizer-slice replacement + reduced-minimizer bucket + packed
columns (reference Brisk.hpp:107-137 keying)."""
from brisk_tpu.index import store
from brisk_tpu.oracle import pyref
from brisk_tpu.params import Parameters


def oracle_key_counts(seqs, k: int, m: int, b: int) -> dict:
    """{packed-key tuple: count mod 256} over every emission of seqs."""
    p = Parameters(k=k, m=m, b=b)
    dede = pyref.get_decycling(m)
    out = {}
    for seq in seqs:
        for rec, _, _ in pyref.scan_emissions(seq, k, m, dede):
            key = pyref.hash_kmer_minimizer(rec.kmer, rec.minimizer_idx,
                                            m, dede)
            slice_hash = pyref.bfc_hash_64(
                (rec.kmer >> (2 * rec.minimizer_idx)) & p.m_mask,
                p.m_mask, dede)
            bucket = pyref.bucket_id(slice_hash, p)
            cols = store.pack_key_np(bucket, key, rec.minimizer_idx, k, b)
            t = tuple(int(x) for x in cols)
            out[t] = (out.get(t, 0) + 1) % 256
    return out
