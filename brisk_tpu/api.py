"""User-facing Brisk API — the TPU-native equivalent of `Brisk<DATA>`
(reference Brisk.hpp:23-228).

The reference exposes a pointer-based mutable API guarded by advisory
locks (protect_data/unprotect_data). Functional TPU arrays dissolve that
entire subsystem (SURVEY §5.2): every mutation is a batched pure update,
so there is nothing to protect. The mapping:

  reference                         brisk_tpu
  --------------------------------  ------------------------------------
  Brisk<DATA>(params)               Brisk(params, ...)
  insert_superkmer(skmer, new?)     insert_sequence(seq) /
                                    insert_file(path)  [batched]
  get(kmer) / get_superkmer(...)    get(kmer_string) / query_file(path)
  protect_data / unprotect_data     (not needed: functional updates)
  next / restart_kmer_enumeration   items() iterator
  stats(...)                        stats()
  reallocate()                      reallocate()  [m+=2, b+=2 re-index]
  BriskWriter::write (KFF)          save(path) / Brisk.load(path)

DATA payloads: the index stores one uint32 cell per k-mer entry (counts
for the counter). Arbitrary fixed-width payloads ride in extra uint32
lanes via `data_width` (reserved; width-1 counts implemented this round).
"""

import time
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import readout, store
from brisk_tpu.io import fasta
from brisk_tpu.oracle import pyref
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.params import Parameters


class Brisk:
    """Dynamic k-mer -> count index with batched insert/query."""

    def __init__(self, params: Parameters, batch: int = 512,
                 window: int = 512, capacity: int = 1 << 16):
        self.params = params
        self.batch = batch
        self.window = window
        self.state = store.empty(capacity)
        self._carry = enum_ops.zero_carry(batch)
        self.n_emitted = 0
        self.n_superkmers = 0

    # -- insertion ---------------------------------------------------------

    def _insert_batches(self, batches) -> None:
        p = self.params
        for bt in batches:
            em, self._carry = enum_ops.enumerate_batch(
                jnp.asarray(bt.codes, dtype=jnp.uint32),
                jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end),
                self._carry, k=p.k, m=p.m, b=p.b)
            rows = store.make_keys(em.bucket.reshape(-1),
                                   em.key.reshape(4, -1),
                                   em.mini_idx.reshape(-1))
            valid = em.valid.reshape(-1)
            # compact-before-grow: tombstone slots are reclaimable, so the
            # capacity (and its expensive compile) only grows when the
            # DEDUPED size approaches it
            raw = rows.shape[1]
            cap = self.state.keys.shape[1]
            if int(self.state.n_used) + raw > cap:
                self.state = store.compact(self.state)
            self.state = store.ensure_room(self.state, raw)
            self.state = store.append(
                self.state, rows,
                jnp.ones(raw, dtype=jnp.uint32), valid)
            self.n_emitted += bt.n_kmers
            self.n_superkmers += int(jnp.sum(em.boundary & em.valid)) + int(
                np.sum(np.asarray(bt.fresh) & (np.asarray(bt.valid_end) > 0)))

    def insert_file(self, path: str) -> None:
        p = self.params
        self._insert_batches(
            fasta.fasta_batches(path, p.k, self.batch, self.window))
        self.state = store.compact(self.state)

    def insert_sequence(self, seq: str) -> None:
        """Counts every k-mer of one sequence (the declared-but-never-
        defined Brisk::insert_sequence, Brisk.hpp:27 — implemented here)."""
        p = self.params
        packer = fasta.BatchPacker(p.k, self.batch, self.window)
        self._insert_batches(packer.pack(iter([seq])))
        self.state = store.compact(self.state)

    # -- lookup ------------------------------------------------------------

    def get_canonical(self, kmer: str) -> Optional[int]:
        """Strand-insensitive count: tries both orientations. The
        reference's str2kmer keying (Kmers.cpp:257-268) only matches
        entries stored in the query's own orientation — minus-strand
        emissions are stored under the RC value and the faithful get()
        misses them, exactly like the reference. This helper is the
        practical lookup."""
        c = self.get(kmer)
        if c is not None:
            return c
        p = self.params
        rc = pyref.num2str(pyref.revcomp(pyref.str2num(kmer), p.k), p.k)
        return self.get(rc)

    def get(self, kmer: str) -> Optional[int]:
        """Count of one k-mer given as an ACGT string, or None if absent.
        Mirrors Brisk::get (Brisk.hpp:63-69): the k-mer is keyed by its own
        minimizer decomposition (orientation-sensitive, like the
        reference — see get_canonical)."""
        p = self.params
        if len(kmer) != p.k:
            raise ValueError(f"need a {p.k}-mer, got {len(kmer)} bases")
        dede = pyref.DecyclingSet(p.m)
        km = pyref.str2kmer_record(kmer, p.m, dede)
        key = pyref.hash_kmer_minimizer(km.kmer, km.minimizer_idx, p.m, dede)
        m_mask = p.m_mask
        slice_hash = pyref.bfc_hash_64(
            (km.kmer >> (2 * km.minimizer_idx)) & m_mask, m_mask, dede)
        bucket = pyref.bucket_id(slice_hash, p)
        cols = np.array(
            [[bucket, (key >> 96) & 0xFFFFFFFF, (key >> 64) & 0xFFFFFFFF,
          (key >> 32) & 0xFFFFFFFF, key & 0xFFFFFFFF, km.minimizer_idx]],
            dtype=np.uint32).T
        found, vals = store.lookup(self.state, jnp.asarray(cols))
        if bool(found[0]):
            return int(vals[0]) % 256
        return None

    def query_file(self, path: str) -> int:
        """Sum of stored counts over every k-mer emission of a query FASTA
        (reference query_fasta, counter.cpp:314-346)."""
        p = self.params
        total = 0
        carry = enum_ops.zero_carry(self.batch)
        for bt in fasta.fasta_batches(path, p.k, self.batch, self.window):
            em, carry = enum_ops.enumerate_batch(
                jnp.asarray(bt.codes, dtype=jnp.uint32),
                jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end),
                carry, k=p.k, m=p.m, b=p.b)
            rows = store.make_keys(em.bucket.reshape(-1),
                                   em.key.reshape(4, -1),
                                   em.mini_idx.reshape(-1))
            found, vals = store.lookup(self.state, rows)
            total += int(jnp.sum(
                jnp.where(found & em.valid.reshape(-1), vals % 256, 0)))
        return total

    # -- enumeration -------------------------------------------------------

    def items(self) -> Iterator[Tuple[int, int]]:
        """(kmer_value, count mod 256) per stored entry — Brisk::next
        (Brisk.hpp:166-172) as an iterator. Entries with the same k-mer
        value under different minimizer keys appear separately, exactly as
        the reference's cursor visits them."""
        kmers, counts, _ = readout.entries(self.state, self.params)
        for kv, c in zip(kmers, counts):
            yield int(kv), int(c) % 256

    def counts_dict(self) -> dict:
        agg = {}
        for kv, c in self.items():
            agg[kv] = (agg.get(kv, 0) + c) % 256
        return agg

    # -- maintenance -------------------------------------------------------

    def stats(self) -> dict:
        n = int(self.state.n_sorted)
        buckets = np.asarray(self.state.keys)[0, :n]
        nb_buckets = int(len(np.unique(buckets))) if n else 0
        largest = int(np.bincount(buckets).max()) if n else 0
        return dict(nb_buckets=nb_buckets, nb_kmers=n,
                    nb_superkmers=self.n_superkmers,
                    nb_emitted=self.n_emitted,
                    largest_bucket_entries=largest)

    def reallocate(self) -> None:
        """Grow minimizer/bucket space: m += 2, b += 2, re-key every stored
        entry under the new minimizer decomposition (reference
        Brisk::reallocate, Brisk.hpp:202-224)."""
        from brisk_tpu.index import rekey
        new_params = Parameters(k=self.params.k, m=self.params.m + 2,
                                b=min(self.params.b + 2, 15))
        self.state = rekey.reindex(self.state, self.params, new_params)
        self.params = new_params

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        """Native checkpoint: the exact sharded-array state + params."""
        self.state = store.compact(self.state)
        np.savez_compressed(
            path,
            keys=np.asarray(self.state.keys),
            data=np.asarray(self.state.data),
            n_sorted=int(self.state.n_sorted),
            n_used=int(self.state.n_used),
            k=self.params.k, m=self.params.m, b=self.params.b,
            n_emitted=self.n_emitted, n_superkmers=self.n_superkmers)

    @classmethod
    def load(cls, path: str, batch: int = 512, window: int = 512
             ) -> "Brisk":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        params = Parameters(k=int(z["k"]), m=int(z["m"]), b=int(z["b"]))
        self = cls(params, batch=batch, window=window,
                   capacity=z["keys"].shape[1])
        self.state = store.IndexState(
            keys=jnp.asarray(z["keys"]), data=jnp.asarray(z["data"]),
            n_sorted=jnp.int32(int(z["n_sorted"])),
            n_used=jnp.int32(int(z["n_used"])))
        self.n_emitted = int(z["n_emitted"])
        self.n_superkmers = int(z["n_superkmers"])
        return self
