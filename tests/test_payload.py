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
