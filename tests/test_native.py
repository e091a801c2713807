"""Native C++ FASTA parser vs the Python oracle reader."""
import numpy as np
import pytest

from brisk_tpu import native
from brisk_tpu.io.fasta import chunk_codes
from brisk_tpu.oracle import pyref


@pytest.fixture(scope="module")
def lib():
    if native.load() is None:
        pytest.skip("native toolchain unavailable")
    return native.load()


@pytest.mark.parametrize("path", ["data/test.fa", "data/debug_test.fa"])
def test_fixture_parity(lib, path):
    got = native.parse_fasta_codes(path)
    exp = [chunk_codes(c) for c in pyref.read_fasta_chunks(path)]
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert np.array_equal(g, e)


def test_messy_fasta(lib, tmp_path):
    p = tmp_path / "messy.fa"
    p.write_text(
        ">r1 header with > inside\n"
        "ACGTacgtNNNNacgt\n"
        "NNNN\nGGGG\n"
        ">r2\n"
        "\n"
        "A>CGT\n"     # '>' mid-line is an invalid char, not a header
        ">r3\nTTTT")  # no trailing newline
    got = native.parse_fasta_codes(str(p))
    exp = [chunk_codes(c) for c in pyref.read_fasta_chunks(str(p))]
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert np.array_equal(g, e)


def test_gzip(lib, tmp_path):
    import gzip
    p = tmp_path / "z.fa.gz"
    with gzip.open(p, "wt") as f:
        f.write(">x\nACGTACGTNACGT\n>y\nTTTT\n")
    got = native.parse_fasta_codes(str(p))
    exp = [chunk_codes(c) for c in pyref.read_fasta_chunks(str(p))]
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert np.array_equal(g, e)


def test_empty_and_missing(lib, tmp_path):
    p = tmp_path / "empty.fa"
    p.write_text("")
    assert native.parse_fasta_codes(str(p)) == []
    with pytest.raises(IOError):
        native.parse_fasta_codes(str(tmp_path / "nope.fa"))
