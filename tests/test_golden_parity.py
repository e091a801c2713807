"""Golden parity against the COMPILED reference (not just the pyref
oracle): builds the reference harness (tests/ref_harness/build.sh), runs
golden_dump, and diffs per-k-mer counts against the ENGINE's counts_dict.

This pins the whole pyramid — if oracle/pyref.py ever drifted from the
reference, these tests catch it (VERDICT r1 item 7; reference oracle
machinery: counter.cpp:90-126).

Marked slow: the harness compiles the reference once per machine.
"""
import os
import subprocess

import pytest

from brisk_tpu.api import Brisk
from brisk_tpu.oracle import pyref
from brisk_tpu.params import Parameters

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DUMP = os.path.join(ROOT, "ref_build", "golden_dump")


def ensure_harness():
    if os.path.exists(DUMP):
        return True
    try:
        subprocess.run([os.path.join(ROOT, "tests", "ref_harness",
                                     "build.sh")],
                       check=True, capture_output=True, timeout=600)
    except Exception:
        return False
    return os.path.exists(DUMP)


def golden_counts(fasta: str, k: int, m: int) -> dict:
    out = subprocess.run([DUMP, fasta, str(k), str(m)],
                         check=True, capture_output=True, text=True,
                         timeout=600).stdout
    counts = {}
    for line in out.splitlines():
        if line.startswith("#"):
            continue
        parts = line.split()
        if len(parts) == 2:
            counts[pyref.str2num(parts[0])] = int(parts[1]) % 256
    return counts


@pytest.fixture(scope="module")
def harness():
    if not ensure_harness():
        pytest.skip("reference harness unavailable (compiler missing?)")


@pytest.mark.slow
@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (63, 21, 14)])
def test_engine_matches_compiled_reference_fixture(harness, k, m, b):
    golden = golden_counts(os.path.join(ROOT, "data", "test.fa"), k, m)
    br = Brisk(Parameters(k=k, m=m, b=b), batch=16, window=128)
    br.insert_file(os.path.join(ROOT, "data", "test.fa"))
    got = {kv: c for kv, c in br.counts_dict().items()}
    assert got == golden


@pytest.mark.slow
def test_engine_matches_compiled_reference_synth(harness, tmp_path):
    """Messy synthetic input (N runs split records) at the flagship
    config."""
    from tests.make_synth_fasta import write_synth
    k, m, b = 31, 11, 8
    path = str(tmp_path / "synth.fa")
    write_synth(path, n_bases=200_000, read_len=7_000, seed=4321)
    golden = golden_counts(path, k, m)
    br = Brisk(Parameters(k=k, m=m, b=b), batch=32, window=256)
    br.insert_file(path)
    assert br.counts_dict() == golden


@pytest.mark.slow
def test_sharded_facade_matches_compiled_reference(harness):
    """The multi-chip facade (8-shard CPU mesh) against the compiled
    reference's golden dump on the fixture."""
    from brisk_tpu.parallel.facade import ShardedBrisk
    k, m, b = 31, 11, 8
    golden = golden_counts(os.path.join(ROOT, "data", "test.fa"), k, m)
    br = ShardedBrisk(Parameters(k=k, m=m, b=b), n_devices=8,
                      batch_per_shard=8, window=64, stack=2)
    br.insert_file(os.path.join(ROOT, "data", "test.fa"))
    assert br.counts_dict() == golden
