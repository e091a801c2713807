"""TPU-native k-mer counter CLI — mirror of the reference demo app
(apps/counter.cpp): count a FASTA, optionally verify (mode 2), query a
second FASTA, print stats.

Usage: python -m brisk_tpu.apps.counter -f in.fa -k 31 -m 11 -b 8 \
           [--mode 0|1|2] [-q query.fa] [--batch B] [--window L]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import readout, store
from brisk_tpu.io import fasta
from brisk_tpu.oracle import pyref
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.params import Parameters


def _emissions_to_rows(em):
    """Flatten an Emissions batch into (keys (6, N), valid (N,)) columns."""
    key = em.key.reshape(4, -1)
    rows = store.make_keys(em.bucket.reshape(-1), key, em.mini_idx.reshape(-1))
    return rows, em.valid.reshape(-1)


class Counter:
    """Streaming count pipeline: FASTA -> batched enumerator -> index."""

    def __init__(self, params: Parameters, batch: int = 512,
                 window: int = 512, capacity: int = 1 << 16):
        self.params = params
        self.batch = batch
        self.window = window
        self.state = store.empty(capacity)
        self.carry = enum_ops.zero_carry(batch)
        self.n_emitted = 0
        self.n_superkmers = 0
        self.n_records = 0

    def count_file(self, path: str):
        p = self.params
        for bt in fasta.fasta_batches(path, p.k, self.batch, self.window):
            em, self.carry = enum_ops.enumerate_batch(
                jnp.asarray(bt.codes, dtype=jnp.uint32),
                jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end),
                self.carry, k=p.k, m=p.m, b=p.b)
            rows, valid = _emissions_to_rows(em)
            # ensure_room for RAW log slots (tombstones included)
            self.state = store.ensure_room(self.state, rows.shape[1])
            self.state = store.append(
                self.state, rows, jnp.ones(rows.shape[1], dtype=jnp.uint32),
                valid)
            self.n_emitted += bt.n_kmers
            self.n_superkmers += int(
                jnp.sum(em.boundary & em.valid)) + int(
                jnp.sum(jnp.asarray(bt.fresh) & (jnp.asarray(bt.valid_end) > 0)))
            # compact when the unsorted log dominates
            if int(self.state.n_used) - int(self.state.n_sorted) > \
                    max(1 << 20, int(self.state.n_sorted)):
                self.state = store.compact(self.state)
        self.state = store.compact(self.state)

    def query_file(self, path: str) -> int:
        p = self.params
        total = 0
        carry = enum_ops.zero_carry(self.batch)
        for bt in fasta.fasta_batches(path, p.k, self.batch, self.window):
            em, carry = enum_ops.enumerate_batch(
                jnp.asarray(bt.codes, dtype=jnp.uint32),
                jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end),
                carry, k=p.k, m=p.m, b=p.b)
            rows, valid = _emissions_to_rows(em)
            found, vals = store.lookup(self.state, rows)
            # stored counts are uint8 in the reference (mod-256 wrap)
            total += int(jnp.sum(jnp.where(found & valid, vals % 256, 0)))
        return total

    def counts_dict(self) -> dict:
        """Aggregated {kmer_value: count mod 256} over index entries."""
        kmers, counts, _ = readout.entries(self.state, self.params)
        agg = {}
        for kv, c in zip(kmers, counts):
            agg[kv] = (agg.get(kv, 0) + int(c)) % 256
        return agg

    def stats(self):
        n = int(self.state.n_sorted)
        buckets = np.asarray(self.state.keys)[0, :n]
        nb_buckets = len(np.unique(buckets)) if n else 0
        largest = int(np.bincount(buckets).max()) if n else 0
        return dict(nb_buckets=nb_buckets, nb_entries=n,
                    nb_superkmers=self.n_superkmers,
                    nb_emitted=self.n_emitted, largest_bucket=largest)


def pretty_int(n: int) -> str:
    return f"{n:,}"


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Brisk-TPU k-mer counter (reference counter.cpp parity)")
    ap.add_argument("-f", "--file", required=True, help="FASTA to count")
    ap.add_argument("-q", "--query", default="", help="FASTA to query")
    ap.add_argument("-k", type=int, default=31)
    ap.add_argument("-m", type=int, default=15)
    ap.add_argument("-b", type=int, default=14)
    ap.add_argument("-o", dest="outfile", default="",
                    help="KFF output file")
    ap.add_argument("--mode", type=int, default=0,
                    help="0: count | 1: perf only | 2: verify vs oracle")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--window", type=int, default=512)
    args = ap.parse_args(argv)

    params = Parameters(k=args.k, m=args.m, b=min(args.b, 15))
    print(f"I'm counting {args.file}")
    print(f"Kmer size:\t{params.k}\nMinimizer size:\t{params.m}\n"
          f"Bucket size:     {params.b}")
    print(f"Devices: {jax.devices()}")

    t0 = time.time()
    counter = Counter(params, batch=args.batch, window=args.window)
    counter.count_file(args.file)
    jax.block_until_ready(counter.state.keys)
    elapsed = time.time() - t0
    print(f"Kmer counted elapsed time: {elapsed:.3f}s")

    if args.mode == 2:
        print("--- Start counting verification ---")
        got = counter.counts_dict()
        exp = pyref.count_fasta(args.file, params.k, params.m)
        if got == exp:
            print("All counts are correct !")
        else:
            extra = {k: v for k, v in got.items() if exp.get(k) != v}
            missing = {k: v for k, v in exp.items() if got.get(k) != v}
            print(f"{len(extra) + len(missing)} errors")
            for kv in list(extra)[:5]:
                print("too many", pyref.num2str(kv, params.k),
                      got[kv], "vs", exp.get(kv, 0))
            for kv in list(missing)[:5]:
                print("missing", pyref.num2str(kv, params.k),
                      got.get(kv, 0), "vs", missing[kv])
            sys.exit(1)

    if args.query:
        t1 = time.time()
        total = counter.query_file(args.query)
        print(f"Query total: {total}")
        print(f"Query elapsed time: {time.time() - t1:.3f}s")

    if args.outfile:
        from brisk_tpu.io import kff
        kff.write_index(args.outfile, counter.state, params)
        print(f"Index written to {args.outfile} (KFF)")

    s = counter.stats()
    print(f"{pretty_int(s['nb_buckets'])} bucket used "
          f"(/{pretty_int(params.n_buckets)} possible)")
    print(f"nb superkmers: {pretty_int(s['nb_superkmers'])}")
    print(f"nb kmers: {pretty_int(s['nb_entries'])}")
    print(f"kmer / second: {pretty_int(int(counter.n_emitted / elapsed))}")
    if s['nb_superkmers']:
        print(f"average kmer / superkmer: "
              f"{s['nb_emitted'] / s['nb_superkmers']:.4f}")
    if s['nb_buckets']:
        print(f"average superkmer / bucket: "
              f"{s['nb_superkmers'] / s['nb_buckets']:.4f}")
    print(f"Largest bucket :\t{pretty_int(s['largest_bucket'])}")


if __name__ == "__main__":
    main()
