"""End-to-end counter pipeline parity on the reference fixtures."""
import pytest

from brisk_tpu.apps.counter import Counter
from brisk_tpu.oracle import pyref
from brisk_tpu.params import Parameters


@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (63, 21, 14)])
def test_count_parity(k, m, b):
    counter = Counter(Parameters(k=k, m=m, b=b), batch=16, window=128)
    counter.count_file("data/test.fa")
    got = counter.counts_dict()
    exp = pyref.count_fasta("data/test.fa", k, m)
    assert got == exp


def test_query_roundtrip():
    """Querying the counted file returns the sum over all emissions'
    stored counts (reference query_sequence, counter.cpp:281-310)."""
    k, m, b = 31, 11, 8
    counter = Counter(Parameters(k=k, m=m, b=b), batch=16, window=128)
    counter.count_file("data/test.fa")
    total = counter.query_file("data/test.fa")
    # every emission finds its entry; total = sum over emissions of the
    # count of that emission's entry
    from collections import Counter as C
    dede = pyref.DecyclingSet(m)
    entry_counts = {}
    emis = []
    for chunk in pyref.read_fasta_chunks("data/test.fa"):
        if len(chunk) < k:
            continue
        for rec, _, _ in pyref.scan_emissions(chunk, k, m, dede):
            kk = (pyref.hash_kmer_minimizer(rec.kmer, rec.minimizer_idx, m,
                                            dede), rec.minimizer_idx)
            emis.append(kk)
            entry_counts[kk] = entry_counts.get(kk, 0) + 1
    exp = sum(entry_counts[kk] % 256 for kk in emis)
    assert total == exp


def test_stats_match_reference_shape():
    k, m, b = 31, 11, 8
    counter = Counter(Parameters(k=k, m=m, b=b), batch=16, window=128)
    counter.count_file("data/test.fa")
    s = counter.stats()
    # values cross-checked against the compiled reference run:
    # 507 buckets, 6163 stored entries (BASELINE.md)
    assert s["nb_buckets"] == 507
    assert s["nb_entries"] == 6163
    assert s["nb_emitted"] == 6169
