"""KFF (k-mer file format) export/import.

The reference serializes its index with BriskWriter (writer.hpp:11-191)
through the external kff_io library — write-only; no reader exists in the
reference (SURVEY §5.4). Here both directions are implemented:

  * write_index: one 'm' (minimizer) section per distinct un-hashed
    minimizer, k-mers written WITHOUT their minimizer bases plus the
    minimizer position, with a parallel data block (counts as uint8,
    mirroring the reference counter's DATA), preceded by a 'v' section
    carrying k, m, max, data_size (writer.hpp:77-90).
  * read_index: parses files written by write_index and rebuilds a count
    dict (the reader the reference never had).

Format caveat (documented): the reference's kff_io submodule is EMPTY in
the snapshot and this environment has no network, so byte-level interop
with upstream kff_io cannot be validated here. The layout follows the
public KFF v1 spec (header magic/version/encoding/flags, 'v' sections,
'm' sections with per-block [count u8][seq][mini position u8][data]);
round-trip fidelity is guaranteed against this module's own reader.
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


def write_index(path: str, state: store.IndexState, params: Parameters
                ) -> None:
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
        f.write(b"KFF")
        f.write(bytes([1, 0]))            # version 1.0
        f.write(bytes([_ENCODING]))
        f.write(bytes([1, 1]))            # uniqueness, canonicity flags
        f.write(struct.pack("<I", 0))     # free block size
        # global variables
        f.write(b"v")
        gvars = [(b"k", k), (b"m", m), (b"max", 255), (b"data_size", 1)]
        f.write(struct.pack("<Q", len(gvars)))
        for name, val in gvars:
            f.write(name + b"\0" + struct.pack("<Q", val))
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
                f.write(bytes([idx]))                   # minimizer position
                f.write(bytes([count]))                 # data block
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
            kb = (k - m + 3) // 4
            for _ in range(nb):
                nk = raw[pos]; pos += 1
                assert nk == 1
                without = _unpack_bases(raw[pos:pos + kb], k - m); pos += kb
                idx = raw[pos]; pos += 1
                count = raw[pos]; pos += 1
                suffix = without & ((1 << (2 * idx)) - 1)
                prefix = without >> (2 * idx)
                kv = (prefix << (2 * (idx + m))) | (mini << (2 * idx)) \
                    | suffix
                counts[kv] = (counts.get(kv, 0) + count) % 256
        else:
            raise ValueError(f"unknown section {sec!r} at {pos - 1}")
    return counts, k, m
