"""KFF export/import round-trip."""
import pytest

from brisk_tpu.api import Brisk
from brisk_tpu.io import kff
from brisk_tpu.params import Parameters


@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (63, 21, 14)])
def test_roundtrip(k, m, b, tmp_path):
    """Per-k-mer (degenerate 1-kmer block) KFF sections, written from
    the transient expanded per-k-mer view."""
    idx = Brisk(Parameters(k=k, m=m, b=b), batch=16, window=128)
    idx.insert_file("data/test.fa")
    path = str(tmp_path / "index.kff")
    kff.write_index(path, idx._expanded_view(), idx.params)
    counts, rk, rm = kff.read_index(path)
    assert (rk, rm) == (k, m)
    assert counts == idx.counts_dict()


@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (63, 21, 14)])
def test_superkmer_blocks_roundtrip(k, m, b, tmp_path):
    """Whole-super-k-mer blocks (write_index_skl) round-trip to the same
    per-value counts as the per-k-mer store."""
    idx = Brisk(Parameters(k=k, m=m, b=b), batch=16, window=128)
    idx.insert_file("data/test.fa")
    idx.finalize()
    path = str(tmp_path / "index_skl.kff")
    kff.write_index_skl(path, idx.skl, idx.params)
    counts, rk, rm = kff.read_index(path)
    assert (rk, rm) == (k, m)
    assert counts == idx.counts_dict()
    # blocks must actually group multiple kmers (space story)
    import numpy as np
    sizes = np.asarray(idx.skl.meta)[:int(idx.skl.n_fin_rows)] & 0xFF
    assert sizes.mean() > 3, sizes.mean()


def test_reject_garbage(tmp_path):
    p = tmp_path / "bad.kff"
    p.write_bytes(b"NOT A KFF FILE")
    with pytest.raises(ValueError):
        kff.read_index(str(p))


def test_kff_spec_vector(tmp_path):
    """Hand-authored KFF v1 bytes straight from the public spec (header
    magic/version/encoding/flags/free-block, 'v' section with 8-byte LE
    values, 'm' section with big-endian left-aligned 2-bit sequences):
    the reader must parse them exactly — closing the upstream-interop
    gap as far as an offline environment allows (VERDICT r3 item 9;
    reference writer: writer.hpp:74-179)."""
    import struct

    from brisk_tpu.oracle import pyref
    k, m = 5, 3
    mini = pyref.str2num("ACG")          # 0b000111 = 7
    buf = b"KFF" + bytes([1, 0])         # magic + version 1.0
    buf += bytes([kff._ENCODING])        # 2-bit encoding byte
    buf += bytes([1, 1])                 # uniqueness, canonicity
    buf += struct.pack("<I", 0)          # free block size
    buf += b"v" + struct.pack("<Q", 4)
    for name, val in [(b"k", k), (b"m", m), (b"max", 5),
                      (b"data_size", 1)]:
        buf += name + b"\0" + struct.pack("<Q", val)
    # one minimizer section, one 2-kmer block: super-k-mer "TACGTA",
    # minimizer ACG at 1 base from the left, seq-without-mini "TTA"
    buf += b"m"
    buf += bytes([(mini << 2) & 0xFF])   # 3 bases, left-aligned in 1 B
    buf += struct.pack("<I", 1)          # nb blocks
    buf += bytes([2])                    # nb k-mers in block
    without = pyref.str2num("TTA")
    buf += bytes([(without << 2) & 0xFF])
    buf += bytes([1])                    # minimizer position from left
    buf += bytes([3, 7])                 # per-k-mer counts
    buf += b"KFF"
    p = tmp_path / "vec.kff"
    p.write_bytes(buf)
    counts, rk, rm = kff.read_index(str(p))
    assert (rk, rm) == (k, m)
    assert counts == {pyref.str2num("TACGT"): 3,
                      pyref.str2num("ACGTA"): 7}


def test_kff_writer_header_spec(tmp_path):
    """The writer's header bytes must sit at the spec offsets (so an
    upstream kff_io reader seeking by the spec finds them)."""
    import struct
    idx = Brisk(Parameters(k=31, m=11, b=8), batch=8, window=64)
    idx.insert_sequence("ACGTACGTTAGCATGCATTACGGATCCGATCGA")
    idx.finalize()
    path = str(tmp_path / "hdr.kff")
    kff.write_index_skl(path, idx.skl, idx.params)
    raw = open(path, "rb").read()
    assert raw[:3] == b"KFF" and raw[-3:] == b"KFF"
    assert raw[3:5] == bytes([1, 0])          # version major.minor
    assert raw[5] == kff._ENCODING
    (free,) = struct.unpack_from("<I", raw, 8)
    assert free == 0
    assert raw[12:13] == b"v"
    (nv,) = struct.unpack_from("<Q", raw, 13)
    assert nv == 4
    # first gvar record: name\0 + u64 LE value
    assert raw[21:23] == b"k\0"
    (kval,) = struct.unpack_from("<Q", raw, 23)
    assert kval == 31
