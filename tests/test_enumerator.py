"""Batched streaming enumerator vs the exact oracle, including multi-batch
record continuation and the hashed-key / bucket pipeline."""
import random

import jax.numpy as jnp
import numpy as np
import pytest

from brisk_tpu.io.fasta import BatchPacker
from brisk_tpu.oracle import pyref
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.params import Parameters

random.seed(77)


def rand_seq(n):
    return "".join(random.choice("ACGT") for _ in range(n))


def run_engine(records, k, m, b, batch=4, l_new=64):
    """Stream records through the packer+enumerator; returns per-lane-step
    emission tuples flattened in (batch, lane, position) order."""
    packer = BatchPacker(k, batch, l_new)
    carry = enum_ops.zero_carry(batch)
    out = []
    for bt in packer.pack(iter(records)):
        em, carry = enum_ops.enumerate_batch(
            jnp.asarray(bt.codes, dtype=jnp.uint32),
            jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end),
            carry, k=k, m=m, b=b)
        valid = np.asarray(em.valid)
        kmer = np.asarray(em.kmer)
        key = np.asarray(em.key)
        fields = {f: np.asarray(getattr(em, f)) for f in
                  ("boundary", "use_rc", "mini_idx", "mini_lo", "mini_hi",
                   "hash_hi", "hash_lo", "bucket")}
        for lane in range(batch):
            idx = np.nonzero(valid[lane])[0]
            for p in idx:
                kv = sum(int(kmer[j, lane, p]) << (32 * j) for j in range(4))
                keyv = sum(int(key[j, lane, p]) << (32 * j) for j in range(4))
                mini = (int(fields["mini_hi"][lane, p]) << 32) | \
                    int(fields["mini_lo"][lane, p])
                hsh = (int(fields["hash_hi"][lane, p]) << 32) | \
                    int(fields["hash_lo"][lane, p])
                out.append(dict(
                    lane=lane, kmer=kv, key=keyv, mini=mini, hash=hsh,
                    mini_idx=int(fields["mini_idx"][lane, p]),
                    boundary=bool(fields["boundary"][lane, p]),
                    use_rc=bool(fields["use_rc"][lane, p]),
                    bucket=int(fields["bucket"][lane, p])))
    return out


def oracle_emissions(records, k, m, b):
    params = Parameters(k=k, m=m, b=b) if m % 2 else None
    dede = pyref.DecyclingSet(m)
    out = []
    for seq in records:
        if len(seq) < k:
            continue
        m_mask = (1 << (2 * m)) - 1
        for rec, boundary, reversed_ in pyref.scan_emissions(seq, k, m, dede):
            key = pyref.hash_kmer_minimizer(rec.kmer, rec.minimizer_idx, m,
                                            dede)
            hsh = pyref.bfc_hash_64(rec.minimizer, m_mask, dede) & m_mask
            # bucket derives from the hash of the ACTUAL slice (which the
            # reference's hash_kmer_minimizer_inplace extracts from the
            # k-mer), not the tracked minimizer value
            slice_ = (rec.kmer >> (2 * rec.minimizer_idx)) & m_mask
            slice_hash = pyref.bfc_hash_64(slice_, m_mask, dede)
            if params is not None:
                bucket = pyref.bucket_id(slice_hash, params)
            else:
                bucket = 0
            out.append(dict(kmer=rec.kmer, key=key, mini=rec.minimizer,
                            hash=hsh, mini_idx=rec.minimizer_idx,
                            boundary=boundary, use_rc=reversed_,
                            bucket=bucket))
    return out


FIELDS = ("kmer", "key", "mini", "hash", "mini_idx", "boundary", "use_rc",
          "bucket")


def compare(records, k, m, b, batch=4, l_new=64):
    got = run_engine(records, k, m, b, batch=batch, l_new=l_new)
    exp = oracle_emissions(records, k, m, b)
    # engine interleaves lanes; regroup per lane then flatten in lane-pull
    # order == record order (lanes pull records round-robin)
    per_lane = {}
    for e in got:
        per_lane.setdefault(e["lane"], []).append(e)
    # reconstruct record order: records are assigned to lanes round-robin
    # on demand. Instead compare as multiset per record boundaries is
    # complex; compare per-record streams by replaying assignment:
    sched = [r for r in records if len(r) >= k]
    # lane assignment: BatchPacker pulls records into lanes in index order
    # each batch; emulate by matching counts per record.
    exp_by_record = []
    i = 0
    dede = pyref.DecyclingSet(m)
    for seq in sched:
        n = len(seq) - k + 1
        exp_by_record.append(exp[i:i + n])
        i += n
    # engine: per lane, emissions arrive in record-concatenated order; the
    # packer assigns records to lanes in a deterministic greedy order.
    # Re-derive that order:
    order = _assignment_order(sched, k, batch, l_new)
    exp_stream = {lane: [] for lane in range(batch)}
    for lane, ridx in order:
        exp_stream[lane].extend(exp_by_record[ridx])
    for lane in range(batch):
        g = per_lane.get(lane, [])
        e = exp_stream[lane]
        assert len(g) == len(e), \
            f"lane {lane}: {len(g)} vs {len(e)} emissions"
        for j, (a, bb) in enumerate(zip(g, e)):
            for f in FIELDS:
                assert a[f] == bb[f], \
                    f"lane {lane} emission {j} field {f}: {a[f]} != {bb[f]}"


def _assignment_order(sched, k, batch, l_new):
    """Replay BatchPacker's lane-assignment decisions."""
    margin = k - 1
    l_buf = margin + l_new
    order = []
    nxt = 0
    active = [None] * batch  # remaining new-base count per lane
    while True:
        progressed = False
        for lane in range(batch):
            if active[lane] is None and nxt < len(sched):
                order.append((lane, nxt))
                rec_len = len(sched[nxt])
                nxt += 1
                n = min(rec_len, l_buf)
                active[lane] = rec_len - n if rec_len > l_buf else None
                progressed = True
            elif active[lane] is not None:
                n = min(active[lane], l_new)
                active[lane] -= n
                if active[lane] == 0:
                    active[lane] = None
                progressed = True
        if not progressed:
            return order


@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (63, 21, 14), (31, 15, 14),
                                   (21, 9, 6), (45, 17, 11), (63, 31, 15),
                                   (5, 3, 2)])
def test_single_batch_records(k, m, b):
    records = [rand_seq(random.randint(k, k + 60)) for _ in range(6)]
    compare(records, k, m, b, batch=4, l_new=80)


@pytest.mark.parametrize("k,m,b", [(31, 11, 8), (63, 21, 14)])
def test_multi_batch_continuation(k, m, b):
    # records much longer than l_new force carry across many batches
    records = [rand_seq(500), rand_seq(k), rand_seq(231), rand_seq(1000),
               rand_seq(k + 1), rand_seq(333)]
    compare(records, k, m, b, batch=2, l_new=48)


def test_repeats_and_palindromes():
    # low-complexity content stresses tie-breaks and palindromic m-mers
    records = ["A" * 100, "AT" * 60, "ACGT" * 30, "AAC" * 40,
               rand_seq(50) + "A" * 40 + rand_seq(50)]
    compare(records, 31, 11, 8, batch=3, l_new=64)
    compare(records, 33, 13, 9, batch=3, l_new=64)


def test_exact_fixture_counts():
    """End-to-end count parity on data/test.fa via engine emissions."""
    k, m, b = 31, 11, 8
    records = list(pyref.read_fasta_chunks("data/test.fa"))
    got = run_engine(records, k, m, b, batch=8, l_new=128)
    counts = {}
    for e in got:
        counts[e["kmer"]] = (counts.get(e["kmer"], 0) + 1) % 256
    exp = pyref.count_fasta("data/test.fa", k, m)
    assert counts == exp
