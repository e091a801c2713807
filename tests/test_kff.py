"""KFF export/import round-trip."""
import pytest

from brisk_tpu.api import Brisk
from brisk_tpu.io import kff
from brisk_tpu.params import Parameters


@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (63, 21, 14)])
def test_roundtrip(k, m, b, tmp_path):
    """Per-k-mer KFF sections from the legacy packed backend."""
    idx = Brisk(Parameters(k=k, m=m, b=b), batch=16, window=128,
                capacity=1 << 14, keep_superkmers=False)
    idx.insert_file("data/test.fa")
    path = str(tmp_path / "index.kff")
    kff.write_index(path, idx.state, idx.params)
    counts, rk, rm = kff.read_index(path)
    assert (rk, rm) == (k, m)
    assert counts == idx.counts_dict()


@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (63, 21, 14)])
def test_superkmer_blocks_roundtrip(k, m, b, tmp_path):
    """Whole-super-k-mer blocks (write_index_skl) round-trip to the same
    per-value counts as the per-k-mer store."""
    idx = Brisk(Parameters(k=k, m=m, b=b), batch=16, window=128,
                capacity=1 << 14)
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
