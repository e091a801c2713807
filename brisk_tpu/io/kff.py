"""KFF (k-mer file format) export/import.

The reference serializes its index with BriskWriter (writer.hpp:11-191)
through the external kff_io library — write-only; no reader exists in the
reference (SURVEY §5.4). Here both directions are implemented:

  * write_index_skl: whole SUPER-K-MER blocks per minimizer section,
    mirroring the reference's write_compacted_sequence_without_mini
    (writer.hpp:103-170, nb kmers = skmer.size at :108): each block is
    [nb_kmers u8][compacted seq without minimizer][mini position u8]
    [nb_kmers count bytes]; `max` gvar = 2(k-m)+1 (the maximal
    super-k-mer; the reference writes 2(k-m), writer.hpp:89 — ours also
    covers the maximal-length block produced by a full window).
  * write_index: the per-k-mer degenerate form (1-kmer blocks), kept for
    states without a super-k-mer arena.
  * read_index: parses both forms and rebuilds a count dict (the reader
    the reference never had).

Format caveat (documented): the reference's kff_io submodule is EMPTY in
the snapshot and this environment has no network, so byte-level interop
with upstream kff_io cannot be validated here. The layout follows the
public KFF v1 spec (header magic/version/encoding/flags, 'v' sections,
'm' sections); round-trip fidelity is guaranteed against this module's
own reader.
"""

import struct
from typing import Dict, Tuple

import numpy as np

from brisk_tpu.index import readout, store
from brisk_tpu.params import Parameters

# encoding byte: 2-bit codes of A,C,G,T in order (A=0,C=1,G=3,T=2)
_ENCODING = (0 << 6) | (1 << 4) | (3 << 2) | 2


def _pack_bases(value: int, n: int) -> bytes:
    """Pack an n-base 2-bit value big-endian (leftmost base in the high
    bits of the first byte), 4 bases/byte — KFF sequence layout
    (cf. to_big_endian_compact, writer.hpp:34-49)."""
    n_bytes = (n + 3) // 4
    # left-align within the byte span
    shifted = value << (2 * (4 * n_bytes - n))
    return shifted.to_bytes(n_bytes, "big")


def _unpack_bases(raw: bytes, n: int) -> int:
    total = int.from_bytes(raw, "big")
    return total >> (2 * (4 * len(raw) - n))


def _write_header(f, k: int, m: int, max_kmers: int) -> None:
    f.write(b"KFF")
    f.write(bytes([1, 0]))            # version 1.0
    f.write(bytes([_ENCODING]))
    f.write(bytes([1, 1]))            # uniqueness, canonicity flags
    f.write(struct.pack("<I", 0))     # free block size
    f.write(b"v")
    gvars = [(b"k", k), (b"m", m), (b"max", max_kmers), (b"data_size", 1)]
    f.write(struct.pack("<Q", len(gvars)))
    for name, val in gvars:
        f.write(name + b"\0" + struct.pack("<Q", val))


def write_index(path: str, state: store.IndexState, params: Parameters
                ) -> None:
    """Per-k-mer export (degenerate 1-kmer blocks) from the packed
    per-k-mer store."""
    kmers, counts, _ = readout.entries(state, params)
    n = len(kmers)
    _, _, _, mini_idx, _ = readout.entries_u64(state, params)
    m_mask = params.m_mask
    k, m = params.k, params.m

    # group entries by (unhashed) minimizer value
    groups: Dict[int, list] = {}
    for i in range(n):
        kv = int(kmers[i])
        idx = int(mini_idx[i])
        mini = (kv >> (2 * idx)) & m_mask
        groups.setdefault(mini, []).append((kv, idx, int(counts[i]) % 256))

    with open(path, "wb") as f:
        _write_header(f, k, m, 2 * (k - m) + 1)
        # one minimizer section per distinct minimizer
        for mini, entries in sorted(groups.items()):
            f.write(b"m")
            f.write(_pack_bases(mini, m))
            f.write(struct.pack("<I", len(entries)))
            for kv, idx, count in entries:
                # k-mer without its minimizer bases (hole at idx..idx+m)
                suffix = kv & ((1 << (2 * idx)) - 1)
                prefix = kv >> (2 * (idx + m))
                without = (prefix << (2 * idx)) | suffix
                f.write(bytes([1]))                     # nb k-mers in block
                f.write(_pack_bases(without, k - m))
                f.write(bytes([k - idx - m]))           # mini pos from LEFT
                f.write(bytes([count]))                 # data block
        f.write(b"KFF")


def write_index_skl(path: str, skl, params: Parameters) -> None:
    """Whole-super-k-mer export from a FINALIZED sklstore arena
    (reference write_compacted_sequence_without_mini, writer.hpp:103-170).

    Per row: reconstruct the un-hashed super-k-mer sequence (re-insert the
    2b bucket bits, invert the minimizer-slice hash), strip the m
    minimizer bases, and write one block with the row's per-k-mer counts.
    The reconstruction math is vectorized; the remaining loop is pure
    byte-emission I/O."""
    from brisk_tpu.index import sklstore

    k, m, b = params.k, params.m, params.b
    cs, s_max, _, nw = sklstore.skl_dims(k, m, b)
    suffix_reduc = (m - b + 1) // 2
    m_mask = params.m_mask
    n = int(skl.n_fin_rows)
    bucket = np.asarray(skl.bucket)[:n].astype(object)
    meta = np.asarray(skl.meta)[:n]
    nucs = np.asarray(skl.nucs)[:, :n].astype(object)
    data = np.asarray(skl.data)
    offs = np.asarray(skl.offs)[:n].astype(np.int64)
    sizes = (meta & 0xFF).astype(np.int64)
    mini_r = ((meta >> 8) & 0xFF).astype(object)  # reduced suffix length

    # vectorized reconstruction (object ints: values exceed 64 bits)
    one = np.full(n, 1, dtype=object)
    V = np.full(n, 0, dtype=object)
    for w in range(nw):
        V = V | (nucs[w] * (1 << (32 * w)))
    low_mask = (one << (2 * mini_r)) - 1
    hashed = (((V >> (2 * mini_r)) << (2 * (mini_r + b)))
              | (bucket << (2 * mini_r)) | (V & low_mask))
    mini_full = mini_r - suffix_reduc  # un-reduced suffix length
    slices_obj = (hashed >> (2 * mini_full)) & m_mask
    slices = np.array([int(x) for x in slices_obj], dtype=np.uint64)
    minis = readout.bfc_hash_inv_np(slices, m_mask).astype(object)
    true_skm = hashed ^ ((slices_obj ^ minis) << (2 * mini_full))
    wo_mask = (one << (2 * mini_full)) - 1
    without = (((true_skm >> (2 * (mini_full + m))) << (2 * mini_full))
               | (true_skm & wo_mask))
    total_len = k + sizes - 1
    pos_left = total_len - np.array([int(x) for x in mini_full]) - m

    order = np.argsort(np.array([int(x) for x in minis], dtype=np.uint64),
                       kind="stable")
    with open(path, "wb") as f:
        _write_header(f, k, m, 2 * (k - m) + 1)
        cur_mini = None
        section = []

        def flush(mini, blocks):
            f.write(b"m")
            f.write(_pack_bases(int(mini), m))
            f.write(struct.pack("<I", len(blocks)))
            for blk in blocks:
                f.write(blk)

        for i in order:
            if cur_mini is not None and int(minis[i]) != cur_mini:
                flush(cur_mini, section)
                section = []
            cur_mini = int(minis[i])
            size = int(sizes[i])
            cnts = (data[offs[i]:offs[i] + size] % 256).astype(np.uint8)
            section.append(
                bytes([size]) + _pack_bases(int(without[i]),
                                            k - m + size - 1)
                + bytes([int(pos_left[i])]) + cnts.tobytes())
        if cur_mini is not None:
            flush(cur_mini, section)
        f.write(b"KFF")


def read_index(path: str) -> Tuple[Dict[int, int], int, int]:
    """Returns ({kmer_value: count}, k, m) from a file written by
    write_index."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:3] != b"KFF" or raw[-3:] != b"KFF":
        raise ValueError("not a KFF file")
    pos = 5  # skip magic + version
    encoding = raw[pos]; pos += 1
    if encoding != _ENCODING:
        raise ValueError(f"unsupported encoding byte {encoding:#x}")
    pos += 2  # flags
    (free_size,) = struct.unpack_from("<I", raw, pos); pos += 4 + free_size

    gvars = {}
    counts: Dict[int, int] = {}
    k = m = None
    while pos < len(raw) - 3:
        sec = raw[pos:pos + 1]; pos += 1
        if sec == b"v":
            (nv,) = struct.unpack_from("<Q", raw, pos); pos += 8
            for _ in range(nv):
                end = raw.index(b"\0", pos)
                name = raw[pos:end].decode(); pos = end + 1
                (val,) = struct.unpack_from("<Q", raw, pos); pos += 8
                gvars[name] = val
            k, m = int(gvars["k"]), int(gvars["m"])
        elif sec == b"m":
            if k is None:
                raise ValueError("'m' section before k/m globals")
            mb = (m + 3) // 4
            mini = _unpack_bases(raw[pos:pos + mb], m); pos += mb
            (nb,) = struct.unpack_from("<I", raw, pos); pos += 4
            for _ in range(nb):
                nk = raw[pos]; pos += 1
                seq_len = k - m + nk - 1
                kb = (seq_len + 3) // 4
                without = _unpack_bases(raw[pos:pos + kb], seq_len)
                pos += kb
                pos_left = raw[pos]; pos += 1
                suf_len = seq_len - pos_left
                prefix = without >> (2 * suf_len)
                full = ((prefix << (2 * (m + suf_len)))
                        | (mini << (2 * suf_len))
                        | (without & ((1 << (2 * suf_len)) - 1)))
                total_len = k + nk - 1
                kmask = (1 << (2 * k)) - 1
                for j in range(nk):
                    count = raw[pos + j]
                    if count == 0:
                        # dead slot (duplicate consolidated elsewhere)
                        continue
                    kv = (full >> (2 * (total_len - k - j))) & kmask
                    counts[kv] = (counts.get(kv, 0) + count) % 256
                pos += nk
        else:
            raise ValueError(f"unknown section {sec!r} at {pos - 1}")
    return counts, k, m
