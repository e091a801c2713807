"""Sequence-parallel windowing (io.windows): coverage, bit-exactness of
windowed emissions vs the sequential scan, and value-level count parity on
adversarial repeat content."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from brisk_tpu.index import pipeline, store
from brisk_tpu.io.windows import WindowPacker, default_warmup
from brisk_tpu.oracle import pyref
from brisk_tpu.ops import enumerate as enum_ops

random.seed(99)

FIELDS = ("boundary", "use_rc", "mini_idx", "mini_lo", "mini_hi",
          "hash_hi", "hash_lo", "bucket")


def rand_seq(n):
    return "".join(random.choice("ACGT") for _ in range(n))


def to_codes(seq):
    raw = np.frombuffer(seq.encode(), dtype=np.uint8)
    return (raw >> 1) & np.uint8(3)


def sequential_emissions(seq, k, m, b):
    """Whole record in ONE lane (the round-1 streaming semantics already
    oracle-verified in test_enumerator.py) -> list of per-kmer dicts."""
    codes = to_codes(seq)[None, :]
    em, _ = enum_ops.enumerate_batch(
        jnp.asarray(codes), jnp.ones(1, bool),
        jnp.asarray([len(seq)], dtype=jnp.int32),
        enum_ops.zero_carry(1), k=k, m=m, b=b)
    return collect(em, lane_order=False)


def collect(em, lane_order=True):
    valid = np.asarray(em.valid)
    fields = {f: np.asarray(getattr(em, f)) for f in FIELDS}
    kmer = np.asarray(em.kmer)
    key = np.asarray(em.key)
    out = []
    for lane in range(valid.shape[0]):
        for p in np.nonzero(valid[lane])[0]:
            d = {f: fields[f][lane, p].item() for f in FIELDS}
            d["kmer"] = sum(int(kmer[j, lane, p]) << (32 * j)
                            for j in range(4))
            d["key"] = sum(int(key[j, lane, p]) << (32 * j)
                           for j in range(4))
            out.append(d)
    return out


def windowed_emissions(seq, k, m, b, batch, l_out, warmup=None):
    packer = WindowPacker(k, m, batch, l_out=l_out, warmup=warmup)
    out = []
    for bt in packer.pack(iter([seq])):
        em, _ = enum_ops.enumerate_batch(
            jnp.asarray(bt.codes), jnp.ones(batch, bool),
            jnp.asarray(bt.valid_end), enum_ops.zero_carry(batch),
            k=k, m=m, b=b, valid_start=jnp.asarray(bt.valid_start))
        out.extend(collect(em))
    return out


def test_window_coverage():
    """Every k-mer index of a record is valid in exactly one window."""
    k, m = 31, 11
    packer = WindowPacker(k, m, batch=4, l_out=64, warmup=44)
    for n in (31, 32, 50, 81, 82, 83, 200, 1003):
        wins, vs, ve = packer.record_windows(np.zeros(n, dtype=np.uint8))
        covered = []
        for i in range(len(wins)):
            # buffer pos p maps to kmer index i*useful + (p - margin)
            for p in range(vs[i], ve[i]):
                covered.append(i * packer.useful + p - packer.margin)
        assert covered == list(range(n - k + 1)), n


def test_windowed_k63_equality_cert_parity():
    """k > 32 inserts route to the exact STREAMING path (round 4: the
    truncation quirk poisons stored-hash comparisons, so the windowed
    equality chain re-syncs only at rare expiry alignments — 31-99% of
    windows repaired; streaming is sequentially exact with zero
    repairs). A long k=63 record must count exactly with (near-)zero
    repairs."""
    from brisk_tpu.api import Brisk
    from brisk_tpu.params import Parameters
    k, m, b = 63, 21, 14
    seq = rand_seq(4000)
    br = Brisk(Parameters(k=k, m=m, b=b), batch=4, window=192, stack=2)
    br.insert_sequence(seq)
    exp = {}
    dede = pyref.DecyclingSet(m)
    for rec, _, _ in pyref.scan_emissions(seq, k, m, dede):
        exp[rec.kmer] = (exp.get(rec.kmer, 0) + 1) % 256
    assert br.counts_dict() == exp
    assert br.n_emitted == len(seq) - k + 1
    # the equality cert certifies nearly everything in-program (round 4:
    # warmup rounded up from 86 to 88 — two extra replay positions past
    # the exact 2*(k-m+1) cycle bound — now re-syncs ALL windows on
    # random data, 0 repairs vs ~half in round 3); when repairs do
    # happen they are BATCHED — few device calls, not one per window
    n_windows = -(-(len(seq) - k + 1) // (192 - default_warmup(k, m)))
    assert br.n_repaired_windows < n_windows // 4, (
        br.n_repaired_windows, n_windows)
    assert br.n_repair_batches <= 8, (br.n_repair_batches,
                                      br.n_repaired_windows)


@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (21, 9, 6), (15, 7, 5)])
def test_windowed_bitexact_random(k, m, b):
    """Windowed emissions == sequential emissions, ALL fields (incl.
    mini_idx and super-k-mer boundaries), on random records."""
    seq = rand_seq(3000)
    exp = sequential_emissions(seq, k, m, b)
    got = windowed_emissions(seq, k, m, b, batch=4, l_out=112)
    assert len(got) == len(exp) == len(seq) - k + 1
    for j, (a, e) in enumerate(zip(got, exp)):
        assert a == e, f"emission {j} differs: {a} vs {e}"


def test_windowed_bitexact_minimal_warmup():
    """warmup = 2*(k-m+1) is the documented default; check it on several
    seeds and window sizes."""
    k, m, b = 31, 11, 8
    for trial in range(3):
        seq = rand_seq(900 + 77 * trial)
        exp = sequential_emissions(seq, k, m, b)
        for l_out in (48, 80, 160):
            got = windowed_emissions(seq, k, m, b, batch=3, l_out=l_out)
            assert got == exp, (trial, l_out)


def test_windowed_repeats_cert_and_repair():
    """Adversarial repeats (duplicate minimizers in one window) can defeat
    warm-up re-sync; the certificate must flag those windows and the
    Brisk repair path must make the final counts EXACT anyway."""
    from brisk_tpu.api import Brisk
    from brisk_tpu.params import Parameters
    k, m, b = 31, 11, 8
    seq = rand_seq(200) + "A" * 300 + rand_seq(100) + "AT" * 151 + \
        rand_seq(200)
    br = Brisk(Parameters(k=k, m=m, b=b), batch=4, window=96, stack=2)
    br.insert_sequence(seq)
    # repeats long enough to span windows must actually trip the cert
    assert br.n_repaired_windows > 0
    exp = {}
    dede = pyref.DecyclingSet(m)
    for rec, _, _ in pyref.scan_emissions(seq, k, m, dede):
        exp[rec.kmer] = (exp.get(rec.kmer, 0) + 1) % 256
    assert br.counts_dict() == exp
    assert br.n_emitted == len(seq) - k + 1


def test_poisoned_window_degrades_not_dies(monkeypatch):
    """A lane whose certificate/bookkeeping is corrupted must NOT crash
    the ingest (round-3 hard asserts, VERDICT r3 weak #8): window-0
    flags are ignored (certified by construction) and a broken stack
    continuity chain falls back to a window-local replay — counts stay
    exact on random data either way."""
    from brisk_tpu.api import Brisk
    from brisk_tpu.index import pipeline as pl
    from brisk_tpu.params import Parameters
    k, m, b = 31, 11, 8
    seq = rand_seq(1500)
    br = Brisk(Parameters(k=k, m=m, b=b), batch=4, window=96, stack=2)
    orig = pl.insert_flat_sklnative
    calls = []

    def poisoned(skl, chunk4, vs, ve, chain, **kw):
        calls.append(1)
        if len(calls) == 2:
            # flush 2 lane (0,0) is a continuation window: suppress its
            # emissions in-program (a REAL cert failure withholds them)
            ve = jnp.asarray(np.asarray(ve)).at[0, 0].set(0)
        out = orig(skl, chunk4, vs, ve, chain, **kw)
        if len(calls) <= 2:
            flags = np.array(out[3])  # writable copy (u8: bit0 = cert)
            flags[0, 0] &= 0xFE  # flush 1: window-0 lane; flush 2: cont.
            out = out[:3] + (jnp.asarray(flags),) + out[4:]
        return out

    monkeypatch.setattr(pl, "insert_flat_sklnative", poisoned)
    orig_retire = Brisk._retire

    def retire_break_chain(self, rec, flags_np=None):
        self._prev_tail = None  # poison stack-continuity bookkeeping
        return orig_retire(self, rec, flags_np)

    monkeypatch.setattr(Brisk, "_retire", retire_break_chain)
    br.insert_sequence(seq)
    br.finalize()
    exp = {}
    dede = pyref.DecyclingSet(m)
    for rec, _, _ in pyref.scan_emissions(seq, k, m, dede):
        exp[rec.kmer] = (exp.get(rec.kmer, 0) + 1) % 256
    assert br.counts_dict() == exp
    assert br.n_degraded_windows >= 2  # both degrade paths taken


def test_pack_flat_matches_pack():
    """The flat transport's device-built windows must equal the host-
    materialized ones of WindowPacker.pack: same codes over [0, ve),
    same valid_start/valid_end/rec/win per window slot."""
    k, m = 31, 11
    B, S = 4, 2
    records = [rand_seq(700), rand_seq(31), rand_seq(35), rand_seq(1500),
               rand_seq(64)]
    recs_np = [to_codes(r) for r in records]
    packer = WindowPacker(k, m, batch=B, l_out=112)
    old = list(packer.pack(iter(recs_np)))
    flushes = list(packer.pack_flat(iter(recs_np), S))
    # flat packing may interleave DEAD gap slots (vs=ve=0, rec=-1) after
    # a record whose last-window tail overflows its aligned span;
    # compare the LIVE windows, whose order must match exactly
    flat_rec0 = np.concatenate([fl.rec for fl in flushes])
    live_f = flat_rec0 >= 0
    flat_codes = np.concatenate([fl.codes for fl in flushes])[live_f]
    flat_vs = np.concatenate([fl.valid_start for fl in flushes])[live_f]
    flat_ve = np.concatenate([fl.valid_end for fl in flushes])[live_f]
    flat_rec = flat_rec0[live_f]
    flat_win = np.concatenate([fl.win for fl in flushes])[live_f]
    old_rec0 = np.concatenate([bt.rec for bt in old])
    live_o = old_rec0 >= 0
    old_codes = np.concatenate([bt.codes for bt in old])[live_o]
    old_vs = np.concatenate([bt.valid_start for bt in old])[live_o]
    old_ve = np.concatenate([bt.valid_end for bt in old])[live_o]
    old_rec = old_rec0[live_o]
    old_win = np.concatenate([bt.win for bt in old])[live_o]
    assert np.array_equal(flat_rec, old_rec)
    assert np.array_equal(flat_win, old_win)
    assert np.array_equal(flat_vs, old_vs)
    assert np.array_equal(flat_ve, old_ve)
    # dead slots must emit nothing
    dead_ve = np.concatenate([fl.valid_end for fl in flushes])[~live_f]
    assert np.all(dead_ve == 0)
    for j in range(len(flat_rec)):
        e = flat_ve[j]
        assert np.array_equal(flat_codes[j][:e], old_codes[j][:e]), j
    assert sum(fl.n_kmers for fl in flushes) == \
        sum(bt.n_kmers for bt in old)
    assert sum(fl.n_records for fl in flushes) == \
        sum(bt.n_records for bt in old)


def test_insert_flat_matches_insert_windows():
    """pipeline.insert_flat_sklnative (device-side window build) must
    produce the same arena rows, counters, certs and chain as
    insert_windows_sklnative fed the host-materialized windows."""
    from brisk_tpu.index import sklstore
    from brisk_tpu.io.windows import pack4
    k, m, b = 31, 11, 8
    B, S = 4, 2
    records = [rand_seq(900), rand_seq(500), rand_seq(64)]
    recs_np = [to_codes(r) for r in records]
    packer = WindowPacker(k, m, batch=B, l_out=112)
    row_cap = 32
    _, _, _, nw = sklstore.skl_dims(k, m, b)

    def run_flat():
        skl = sklstore.empty(1 << 12, 1 << 10, nw)
        chain = pipeline.zero_chain()
        outs = []
        for fl in packer.pack_flat(iter(recs_np), S):
            (skl, n_sk, n_km, flags, _e, nr,
             chain) = pipeline.insert_flat_sklnative(
                skl, jnp.asarray(fl.chunk4),
                jnp.asarray(fl.valid_start.reshape(S, B)),
                jnp.asarray(fl.valid_end.reshape(S, B)), chain,
                k=k, m=m, b=b, row_cap=row_cap, l_buf=packer.l_buf,
                useful=packer.useful)
            outs.append((int(n_sk), int(n_km), np.asarray(flags).copy()))
        return skl, outs

    def run_stacked():
        skl = sklstore.empty(1 << 12, 1 << 10, nw)
        chain = pipeline.zero_chain()
        outs = []
        pending = list(packer.pack(iter(recs_np)))
        while len(pending) % S:
            pending.append(pending[-1].__class__(
                np.zeros((B, packer.l_buf4), np.uint8),
                np.zeros(B, np.int32), np.zeros(B, np.int32), 0, 0,
                np.full(B, -1, np.int64), np.zeros(B, np.int32),
                packer.l_buf))
        for i in range(0, len(pending), S):
            sts = pending[i:i + S]
            (skl, n_sk, n_km, flags, _e, nr,
             chain) = pipeline.insert_windows_sklnative(
                skl, jnp.asarray(np.stack([x.codes4 for x in sts])),
                jnp.asarray(np.stack([x.valid_start for x in sts])),
                jnp.asarray(np.stack([x.valid_end for x in sts])), chain,
                k=k, m=m, b=b, row_cap=row_cap, l_buf=packer.l_buf)
            outs.append((int(n_sk), int(n_km), np.asarray(flags).copy()))
        return skl, outs

    skl_f, outs_f = run_flat()
    skl_s, outs_s = run_stacked()
    nf, ns = int(skl_f.n_rows), int(skl_s.n_rows)
    assert nf == ns
    # the flat packing inserts dead gap slots, shifting windows across
    # batch/flush boundaries — totals must match but per-flush splits
    # and arena row ORDER may differ: compare the row MULTISET
    assert sum(o[0] for o in outs_f) == sum(o[0] for o in outs_s)
    assert sum(o[1] for o in outs_f) == sum(o[1] for o in outs_s)

    def row_set(skl, n):
        bu = np.asarray(skl.bucket)[:n]
        me = np.asarray(skl.meta)[:n]
        nu = np.asarray(skl.nucs)[:, :n]
        rows = [tuple([int(bu[i]), int(me[i])]
                      + [int(nu[w, i]) for w in range(nu.shape[0])])
                for i in range(n)]
        return sorted(rows)

    assert row_set(skl_f, nf) == row_set(skl_s, ns)


def test_insert_windows_count_parity():
    """Fused window-stack insert -> compact -> counts == oracle counts."""
    k, m, b = 31, 11, 8
    records = [rand_seq(700), rand_seq(31), rand_seq(1500), rand_seq(64)]
    packer = WindowPacker(k, m, batch=8, l_out=112)
    batches = list(packer.pack(iter(records)))
    S = len(batches)
    codes = jnp.asarray(np.stack([bt.codes for bt in batches]))
    vs = jnp.asarray(np.stack([bt.valid_start for bt in batches]))
    ve = jnp.asarray(np.stack([bt.valid_end for bt in batches]))
    st = store.empty(1 << 14, store.key_words(k, b))
    st, n_sk, n_km, cert, _, _ = pipeline.insert_windows(
        st, codes, vs, ve, pipeline.zero_chain(), k=k, m=m, b=b)
    st = store.compact(st)
    total_kmers = sum(len(r) - k + 1 for r in records)
    # random data: every window certifies, nothing dropped
    assert bool(np.all(np.asarray(cert).reshape(-1)[
        np.concatenate([bt.rec for bt in batches]) >= 0]))
    assert int(n_km) == total_kmers

    from brisk_tpu.index import readout
    from brisk_tpu.params import Parameters
    kmers, counts, _ = readout.entries(st, Parameters(k=k, m=m, b=b))
    got = {}
    for kv, c in zip(kmers, counts):
        got[int(kv)] = (got.get(int(kv), 0) + int(c)) % 256
    exp = {}
    dede = pyref.DecyclingSet(m)
    for seq in records:
        for rec, _, _ in pyref.scan_emissions(seq, k, m, dede):
            exp[rec.kmer] = (exp.get(rec.kmer, 0) + 1) % 256
    assert got == exp


def test_brisk_windowed_file_parity():
    """Brisk.insert_file (windowed product path) == oracle on a multi-
    record FASTA with a long record."""
    import os
    import tempfile
    from brisk_tpu.api import Brisk
    from brisk_tpu.params import Parameters
    k, m, b = 31, 11, 8
    records = [rand_seq(2000), rand_seq(45), rand_seq(800)]
    with tempfile.NamedTemporaryFile("w", suffix=".fa", delete=False) as f:
        for i, r in enumerate(records):
            f.write(f">r{i}\n{r}\n")
        path = f.name
    try:
        br = Brisk(Parameters(k=k, m=m, b=b), batch=8, window=112, stack=2)
        br.insert_file(path)
        exp = pyref.count_fasta(path, k, m)
        assert br.counts_dict() == exp
        assert br.n_emitted == sum(len(r) - k + 1 for r in records)
    finally:
        os.unlink(path)
