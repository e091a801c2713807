"""Generic DATA payloads (Brisk<DATA>, reference Brisk.hpp:23-42):
width-D uint32 lanes with per-lane merge kinds through
insert/get/update/compact/reallocate/save."""
import random

import numpy as np
import pytest

from brisk_tpu.data_api import BriskData
from brisk_tpu.oracle import pyref
from brisk_tpu.params import Parameters

random.seed(5)


def rand_seq(n):
    return "".join(random.choice("ACGT") for _ in range(n))


def expected_payload(seq, k, m):
    """value -> (count, last_pos, first_pos) from the oracle scan."""
    dede = pyref.DecyclingSet(m)
    exp = {}
    for i, (rec, _, _) in enumerate(pyref.scan_emissions(seq, k, m, dede)):
        c, lp, fp = exp.get(rec.kmer, (0, 0, 1 << 62))
        exp[rec.kmer] = (c + 1, max(lp, i), min(fp, i))
    return exp


def aggregate(bd):
    """items() aggregated by k-mer value under the lane kinds."""
    agg = {}
    for kv, lanes in bd.items():
        if kv not in agg:
            agg[kv] = lanes
        else:
            cur = agg[kv]
            merged = []
            for x, y, kind in zip(cur, lanes, bd.kinds):
                merged.append(x + y if kind == "sum"
                              else max(x, y) if kind == "max" else min(x, y))
            agg[kv] = tuple(merged)
    return agg


def test_count_last_first_position():
    """width-3 (count, last-pos, first-pos) with forced k-mer repeats."""
    k, m, b = 31, 11, 8
    core = rand_seq(120)
    seq = core + rand_seq(60) + core  # every core k-mer occurs twice
    bd = BriskData(Parameters(k=k, m=m, b=b), width=3,
                   kinds=("sum", "max", "min"))
    bd.insert_sequence(seq)

    exp = expected_payload(seq, k, m)
    got = {kv: lanes for kv, lanes in aggregate(bd).items()}
    assert got == exp
    assert any(c > 1 for c, _, _ in exp.values())  # repeats exercised

    # point get on a repeated k-mer (same key both occurrences)
    s = core[:k]
    v = pyref.str2num(s)
    rv = pyref.revcomp(v, k)
    res = bd.get(s) or bd.get(pyref.num2str(rv, k))
    assert res is not None


def test_update_merges_under_kinds(tmp_path):
    k, m, b = 31, 11, 8
    seq = rand_seq(100)
    bd = BriskData(Parameters(k=k, m=m, b=b), width=2,
                   kinds=("sum", "max"))
    bd.insert_sequence(seq)
    exp = expected_payload(seq, k, m)

    # batched upsert: +5 count, last_pos -> max(old, 10_000); plus a NEW
    # k-mer not in the sequence
    s_old = seq[:k]
    s_new = None
    while s_new is None:
        cand = rand_seq(k)
        if pyref.str2num(cand) not in exp and \
                pyref.revcomp(pyref.str2num(cand), k) not in exp:
            s_new = cand
    before = bd.get(s_old) or bd.get(pyref.num2str(
        pyref.revcomp(pyref.str2num(s_old), k), k))
    target = s_old if bd.get(s_old) else pyref.num2str(
        pyref.revcomp(pyref.str2num(s_old), k), k)
    bd.update([target, s_new], np.array([[5, 7], [10_000, 3]], np.uint32))
    after = bd.get(target)
    assert after == (before[0] + 5, max(before[1], 10_000))
    assert bd.get(s_new) == (7, 3)

    # reallocate (m += 2, b += 2) preserves aggregates by value
    agg_before = aggregate(bd)
    bd.reallocate()
    assert bd.params.m == m + 2
    assert aggregate(bd) == agg_before

    # save / load round-trip keeps lanes and kinds
    p = str(tmp_path / "pl.npz")
    bd.save(p)
    bd2 = BriskData.load(p)
    assert bd2.kinds == bd.kinds
    assert aggregate(bd2) == agg_before
    assert bd2.get(s_new) == (7, 3)


def test_long_sequence_multibatch():
    """Carry across enumerator batches keeps positions exact."""
    k, m, b = 31, 11, 8
    seq = rand_seq(1500)  # > window=256 -> several carry batches
    bd = BriskData(Parameters(k=k, m=m, b=b), width=2)
    bd.insert_sequence(seq)
    exp = {kv: (c, lp) for kv, (c, lp, _) in
           expected_payload(seq, k, m).items()}
    assert aggregate(bd) == exp


def test_insert_file_windowed_payload_parity(tmp_path):
    """BriskData.insert_file runs the fused windowed pipeline with
    (count, position) payloads: counts match the oracle and positions
    obey the 'max' (last-occurrence) lane kind (VERDICT r2 item 6)."""
    import random as _r
    from brisk_tpu.data_api import BriskData
    from brisk_tpu.oracle import pyref
    _r.seed(31)
    k, m, b = 31, 11, 8
    records = ["".join(_r.choice("ACGT") for _ in range(n))
               for n in (900, 45, 2200)]
    path = str(tmp_path / "in.fa")
    with open(path, "w") as f:
        for i, rec in enumerate(records):
            f.write(f">r{i}\n{rec}\n")
    bd = BriskData(Parameters(k=k, m=m, b=b), width=2, batch=8,
                   window=64, stack=2)
    bd.insert_file(path)

    # oracle: per stored-orientation k-mer value -> (count, last pos)
    dede = pyref.DecyclingSet(m)
    got = {kv: lanes for kv, lanes in bd.items()}
    exp2 = {}
    for rec in records:
        for pos, (recd, _, _) in enumerate(
                pyref.scan_emissions(rec, k, m, dede)):
            c, p = exp2.get(recd.kmer, (0, -1))
            exp2[recd.kmer] = (c + 1, max(p, pos))
    assert got == {kv: (c, p) for kv, (c, p) in exp2.items()}
    assert bd.n_emitted == sum(len(r) - k + 1 for r in records)


def test_update_defers_compaction():
    """update() appends without a per-call device sort; reads see the
    merged values via lazy compaction."""
    from brisk_tpu.data_api import BriskData
    bd = BriskData(Parameters(k=21, m=9, b=6), width=2, batch=8,
                   window=64)
    import random as _r
    _r.seed(8)
    seq = "".join(_r.choice("ACGT") for _ in range(400))
    bd.insert_sequence(seq)
    # get() keying is orientation/state-sensitive (like the reference's
    # str2kmer); pick a k-mer whose scalar key hits
    kmer = before = None
    for i in range(0, len(seq) - 21, 3):
        kmer = seq[i:i + 21]
        before = bd.get(kmer)
        if before is not None:
            break
    assert before is not None
    n_sorted0 = int(bd.state.n_sorted)
    for i in range(5):
        bd.update([kmer], np.array([[7], [100 + i]], dtype=np.uint32))
        # no compaction inside update: the unsorted log grows
    assert int(bd.state.n_used) > int(bd.state.n_sorted)
    after = bd.get(kmer)
    assert after[0] == before[0] + 5 * 7
    assert after[1] == 104
