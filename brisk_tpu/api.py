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

from brisk_tpu.index import pipeline, readout, store
from brisk_tpu.io import fasta, windows
from brisk_tpu.oracle import pyref
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.params import Parameters


class Brisk:
    """Dynamic k-mer -> count index with batched insert/query.

    Insertion runs the fused sequence-parallel pipeline for k <= 32:
    records are split into overlapping windows (io.windows) spread across
    all lanes, a stack of `stack` batches is inserted per device program
    (pipeline.insert_windows), and the rare windows whose warm-up replay
    failed the re-sync certificate are re-run exactly through the
    streaming carry path (_repair_window). For k > 32 the streaming
    BatchPacker path is used (one record per lane)."""

    def __init__(self, params: Parameters, batch: int = 512,
                 window: int = 512, capacity: int = 1 << 16,
                 stack: int = 8, keep_superkmers: bool = True):
        self.params = params
        self.batch = batch
        self.window = window
        self.stack = stack
        self.state = store.empty(capacity, store.key_words(params.k,
                                                             params.b))
        self._carry = enum_ops.zero_carry(batch)
        self.n_emitted = 0
        self.n_superkmers = 0
        self.n_repaired_windows = 0
        self.keep_superkmers = keep_superkmers
        # rows kept per lane in the fused skl segmentation; lanes with
        # more super-k-mers are re-run at full width (rare: avg size is
        # ~6-12 kmers, overflow needs avg < 4)
        self.skl_row_cap = max(16, window // 4)
        self.n_skl_overflows = 0
        self.skl = None
        if keep_superkmers:
            from brisk_tpu.index import sklstore
            _, _, _, nw = sklstore.skl_dims(params.k, params.m, params.b)
            # presize for one full window-stack flush so the arena does
            # not regrow (and re-trigger the fused program's compile) on
            # the first insert: each flush appends S*B*row_cap raw rows
            flush_rows = stack * batch * self.skl_row_cap
            rcap = 1 << max(14, (2 * flush_rows - 1).bit_length())
            self.skl = sklstore.empty(rcap, 1 << 14, nw)

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
                                   em.mini_idx.reshape(-1), p.k, p.b)
            valid = em.valid.reshape(-1)
            # compact-before-grow: tombstone slots are reclaimable, so the
            # capacity (and its expensive compile) only grows when the
            # DEDUPED size approaches it
            raw = rows.shape[1]
            cap = self.state.keys.shape[1]
            if int(self.state.n_used) + raw > cap:
                self.state = store.compact_auto(self.state, full=False)
                if int(self.state.n_used) + raw > cap:
                    # fast mode left duplicate tombstones; reclaim fully
                    self.state = store.compact_auto(self.state)
            self.state = store.ensure_room(self.state, raw)
            self.state = store.append(
                self.state, rows,
                jnp.ones(raw, dtype=jnp.uint32), valid)
            self.n_emitted += bt.n_kmers
            self.n_superkmers += int(jnp.sum(em.boundary & em.valid)) + int(
                np.sum(np.asarray(bt.fresh) & (np.asarray(bt.valid_end) > 0)))
            if self.keep_superkmers:
                # super-k-mers split at batch seams (separate rows with
                # identical k-mer content; counts unaffected)
                L_out = em.valid.shape[1]
                margin = p.k - 1
                pos = jnp.arange(margin, margin + L_out,
                                 dtype=jnp.uint32)[None, :]
                first_valid = jnp.broadcast_to(pos == jnp.uint32(margin),
                                               em.valid.shape)
                self._append_skl_from_emissions(em, em.valid, first_valid,
                                                L_out)

    def _records(self, path: str):
        """Record stream (uint8 code arrays or ACGT strings), preferring
        the native C++ parser."""
        from brisk_tpu import native
        chunks = native.parse_fasta_codes(path)
        if chunks is not None:
            return iter(chunks)
        return pyref.read_fasta_chunks(path)

    def insert_file(self, path: str) -> None:
        p = self.params
        if p.k <= 32:
            self._insert_windowed(self._records(path))
        else:
            self._insert_batches(
                fasta.fasta_batches(path, p.k, self.batch, self.window))
        self.state = store.compact_auto(self.state, full=False)

    def insert_sequence(self, seq: str) -> None:
        """Counts every k-mer of one sequence (the declared-but-never-
        defined Brisk::insert_sequence, Brisk.hpp:27 — implemented here)."""
        p = self.params
        if p.k <= 32:
            self._insert_windowed(iter([seq]))
        else:
            packer = fasta.BatchPacker(p.k, self.batch, self.window)
            self._insert_batches(packer.pack(iter([seq])))
        self.state = store.compact_auto(self.state, full=False)

    # -- fused sequence-parallel insertion (k <= 32) -------------------------

    def _insert_windowed(self, records) -> None:
        p = self.params
        packer = windows.WindowPacker(p.k, p.m, self.batch,
                                      l_out=self.window)
        self._packer = packer
        self._prev_tail = None  # (rec, win, end7) of last lane of prev stack
        S = self.stack
        pending = []
        for bt in packer.pack(records):
            pending.append(bt)
            if len(pending) == S:
                self._flush_window_stack(packer, pending)
                pending = []
        if pending:
            B, L_buf = self.batch, packer.l_buf
            while len(pending) < S:  # pad to the compiled stack shape
                pending.append(windows.WinBatch(
                    np.zeros((B, L_buf), np.uint8),
                    np.zeros(B, np.int32), np.zeros(B, np.int32), 0, 0,
                    np.full(B, -1, np.int64), np.zeros(B, np.int32)))
            self._flush_window_stack(packer, pending)

    def _flush_window_stack(self, packer, batches) -> None:
        p = self.params
        S, B = len(batches), self.batch
        codes = np.stack([bt.codes for bt in batches])
        vs = np.stack([bt.valid_start for bt in batches])
        ve = np.stack([bt.valid_end for bt in batches])
        raw = S * B * packer.l_out
        cap = self.state.keys.shape[1]
        if int(self.state.n_used) + raw > cap:
            self.state = store.compact_auto(self.state, full=False)
            if int(self.state.n_used) + raw > cap:
                self.state = store.compact_auto(self.state)
        self.state = store.ensure_room(self.state, raw)
        ovf = None
        if self.keep_superkmers:
            from brisk_tpu.index import sklstore
            self.skl = sklstore.ensure_room_compressing(
                self.skl, S * B * self.skl_row_cap)
            (self.state, self.skl, n_sk, n_km, cert, ends,
             ovf) = pipeline.insert_windows_skl(
                self.state, self.skl, jnp.asarray(codes), jnp.asarray(vs),
                jnp.asarray(ve), k=p.k, m=p.m, b=p.b,
                row_cap=self.skl_row_cap)
        else:
            self.state, n_sk, n_km, cert, ends = pipeline.insert_windows(
                self.state, jnp.asarray(codes), jnp.asarray(vs),
                jnp.asarray(ve), k=p.k, m=p.m, b=p.b)
        self.n_emitted += int(n_km)
        self.n_superkmers += int(n_sk) + sum(bt.n_records for bt in batches)

        cert_f = np.asarray(cert).reshape(-1)
        rec_f = np.concatenate([bt.rec for bt in batches])
        win_f = np.concatenate([bt.win for bt in batches])
        ends_f = [np.asarray(x).reshape(S * B) for x in ends]
        failed = np.nonzero((~cert_f) & (rec_f >= 0))[0]
        repaired_ends = {}

        def end_of(j):
            """Exact end state of flat lane j (certified or repaired)."""
            if j in repaired_ends:
                return repaired_ends[j]
            return tuple(e[j] for e in ends_f)

        for j in failed:
            r, w = int(rec_f[j]), int(win_f[j])
            assert w > 0, "window 0 is always certified"
            if j == 0:
                pr, pw, carry7 = self._prev_tail
                assert (pr, pw) == (r, w - 1), "stack continuity broken"
            else:
                assert rec_f[j - 1] == r and win_f[j - 1] == w - 1
                carry7 = end_of(j - 1)
            s, lane = divmod(int(j), B)
            end7, nk, nsk = self._repair_window(packer, batches[s], lane,
                                                carry7)
            repaired_ends[int(j)] = end7
            self.n_emitted += nk
            self.n_superkmers += nsk
            self.n_repaired_windows += 1

        live = np.nonzero(rec_f >= 0)[0]
        if len(live):
            j = int(live[-1])
            self._prev_tail = (int(rec_f[j]), int(win_f[j]), end_of(j))

        # skl segmentation overflow (certified lanes with more super-k-mers
        # than the fused row budget): rebuild their skl rows at full width
        if ovf is not None:
            ovf_f = np.asarray(ovf).reshape(-1)
            for j in np.nonzero(ovf_f & cert_f & (rec_f >= 0))[0]:
                s, lane = divmod(int(j), B)
                self._repair_skl_overflow(batches[s], lane)
                self.n_skl_overflows += 1

    def _append_skl_from_emissions(self, em, valid, first_valid,
                                   row_cap: int) -> None:
        """Build + append compacted super-k-mer rows for a (small) repair
        emission batch at full row width."""
        from brisk_tpu.index import sklstore
        p = self.params
        rb, rm, rn, ovf = sklstore.rows_from_emissions(
            em.key, em.bucket, em.mini_idx, em.use_rc, valid,
            first_valid, em.boundary, p.k, p.m, p.b, row_cap)
        assert not bool(np.any(np.asarray(ovf)))
        raw = int(np.prod(np.asarray(rb).shape))
        self.skl = sklstore.ensure_room_compressing(self.skl, raw)
        self.skl = sklstore.append(self.skl, rb.reshape(-1),
                                   rm.reshape(-1),
                                   rn.reshape(rn.shape[0], -1))

    def _repair_skl_overflow(self, bt, lane) -> None:
        """Re-run one certified lane's skl segmentation at full row width
        (its per-kmer rows were already inserted by the fused program)."""
        p = self.params
        codes1 = jnp.asarray(bt.codes[lane][None, :])
        vs1 = jnp.asarray([int(bt.valid_start[lane])], dtype=jnp.int32)
        ve1 = jnp.asarray([int(bt.valid_end[lane])], dtype=jnp.int32)
        em, _ = enum_ops.enumerate_batch(
            codes1, jnp.ones(1, bool), ve1, enum_ops.zero_carry(1),
            k=p.k, m=p.m, b=p.b, valid_start=vs1)
        L_out = em.valid.shape[1]
        margin = p.k - 1
        pos = jnp.arange(margin, margin + L_out, dtype=jnp.uint32)[None, :]
        first_valid = pos == vs1[:, None].astype(jnp.uint32)
        self._append_skl_from_emissions(em, em.valid, first_valid, L_out)

    def _repair_window(self, packer, bt, lane, carry7):
        """Exact re-run of one window through the streaming carry path,
        seeded with the true machine state at the end of the previous
        window (see io.windows: warm-up re-sync certificate)."""
        p = self.params
        warmup = packer.warmup
        codes1 = jnp.asarray(bt.codes[lane][None, warmup:])
        carry = enum_ops.MinimizerState(
            *(jnp.asarray(np.asarray([v])) for v in carry7))
        ve1 = jnp.asarray([int(bt.valid_end[lane]) - warmup],
                          dtype=jnp.int32)
        em, end = enum_ops.enumerate_batch(
            codes1, jnp.zeros(1, bool), ve1, carry, k=p.k, m=p.m, b=p.b)
        rows = store.make_keys(em.bucket.reshape(-1), em.key.reshape(4, -1),
                               em.mini_idx.reshape(-1), p.k, p.b)
        valid = em.valid.reshape(-1)
        raw = rows.shape[1]
        if int(self.state.n_used) + raw > self.state.keys.shape[1]:
            self.state = store.compact_auto(self.state)
        self.state = store.ensure_room(self.state, raw)
        self.state = store.append(self.state, rows,
                                  jnp.ones(raw, dtype=jnp.uint32), valid)
        if self.keep_superkmers:
            L_out = em.valid.shape[1]
            margin = p.k - 1
            pos = jnp.arange(margin, margin + L_out,
                             dtype=jnp.uint32)[None, :]
            first_valid = pos == jnp.uint32(margin)
            self._append_skl_from_emissions(em, em.valid, first_valid,
                                            L_out)
        end7 = tuple(np.asarray(x)[0] for x in end)
        return (end7, int(jnp.sum(valid)),
                int(jnp.sum(em.boundary & em.valid)))

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
        cols = store.pack_key_np(bucket, key, km.minimizer_idx,
                                 p.k, p.b)[:, None]
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
                                   em.mini_idx.reshape(-1), p.k, p.b)
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
        p = self.params
        n = int(self.state.n_sorted)
        counts = np.asarray(self.state.data)[:n]
        live = counts != 0  # compact_fast leaves zero-data tombstones
        n_live = int(np.count_nonzero(live))
        if n_live:
            keys = np.asarray(self.state.keys)[:, :n][:, live]
            buckets, _, _, _ = store.unpack_keys_np(keys, p.k, p.b)
            nb_buckets = int(len(np.unique(buckets)))
            largest = int(np.bincount(buckets).max())
        else:
            nb_buckets = largest = 0
        key_bytes = self.state.keys.nbytes + self.state.data.nbytes
        return dict(nb_buckets=nb_buckets, nb_kmers=n_live,
                    nb_superkmers=self.n_superkmers,
                    nb_emitted=self.n_emitted,
                    largest_bucket_entries=largest,
                    index_bytes=key_bytes,
                    bytes_per_kmer=(key_bytes / n_live) if n_live else 0.0)

    def finalize(self) -> None:
        """Consolidate the compacted super-k-mer arena (C8): duplicate
        k-mer counts merge onto one slot, dead rows are dropped, per-slot
        counts land in the data arena. After this, stats() reports the
        resident super-k-mer memory footprint and KFF export writes whole
        super-k-mer blocks."""
        if self.skl is None:
            return
        from brisk_tpu.index import sklstore
        p = self.params
        self.skl = sklstore.finalize(self.skl, p.k, p.m, p.b)

    def skl_stats(self) -> Optional[dict]:
        if self.skl is None:
            return None
        from brisk_tpu.index import sklstore
        return sklstore.stats(self.skl)

    def reallocate(self) -> None:
        """Grow minimizer/bucket space: m += 2, b += 2, re-key every stored
        entry under the new minimizer decomposition (reference
        Brisk::reallocate, Brisk.hpp:202-224)."""
        from brisk_tpu.index import rekey
        new_params = Parameters(k=self.params.k, m=self.params.m + 2,
                                b=min(self.params.b + 2, 15))
        self.state = rekey.reindex(self.state, self.params, new_params)
        self.params = new_params
        if self.skl is not None:
            # super-k-mer grouping is invalid under the new (m, b); rebuild
            # one size-1 row per entry (the reference's reallocate, walking
            # its cursor in bucket order, likewise loses genome adjacency)
            from brisk_tpu.index import sklstore
            self.skl = sklstore.from_entries(self.state, new_params.k,
                                             new_params.m, new_params.b)

    # -- persistence -------------------------------------------------------

    def save(self, path: str) -> None:
        """Native checkpoint: the exact sharded-array state + params
        (+ the compacted super-k-mer arena when kept)."""
        self.state = store.compact_auto(self.state, full=False)
        extra = {}
        if self.skl is not None:
            self.finalize()
            extra = dict(
                skl_bucket=np.asarray(self.skl.bucket),
                skl_meta=np.asarray(self.skl.meta),
                skl_nucs=np.asarray(self.skl.nucs),
                skl_data=np.asarray(self.skl.data),
                skl_offs=np.asarray(self.skl.offs),
                skl_n=np.array([int(self.skl.n_rows),
                                int(self.skl.n_fin_rows),
                                int(self.skl.n_fin_kmers)]))
        np.savez_compressed(
            path,
            keys=np.asarray(self.state.keys),
            data=np.asarray(self.state.data),
            n_sorted=int(self.state.n_sorted),
            n_used=int(self.state.n_used),
            k=self.params.k, m=self.params.m, b=self.params.b,
            n_emitted=self.n_emitted, n_superkmers=self.n_superkmers,
            **extra)

    @classmethod
    def load(cls, path: str, batch: int = 512, window: int = 512
             ) -> "Brisk":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        params = Parameters(k=int(z["k"]), m=int(z["m"]), b=int(z["b"]))
        has_skl = "skl_bucket" in z
        self = cls(params, batch=batch, window=window,
                   capacity=z["keys"].shape[1], keep_superkmers=has_skl)
        self.state = store.IndexState(
            keys=jnp.asarray(z["keys"]), data=jnp.asarray(z["data"]),
            n_sorted=jnp.int32(int(z["n_sorted"])),
            n_used=jnp.int32(int(z["n_used"])))
        self.n_emitted = int(z["n_emitted"])
        self.n_superkmers = int(z["n_superkmers"])
        if has_skl:
            from brisk_tpu.index import sklstore
            nr, nfr, nfk = (int(x) for x in z["skl_n"])
            self.skl = sklstore.SklState(
                bucket=jnp.asarray(z["skl_bucket"]),
                meta=jnp.asarray(z["skl_meta"]),
                nucs=jnp.asarray(z["skl_nucs"]),
                data=jnp.asarray(z["skl_data"]),
                offs=jnp.asarray(z["skl_offs"]),
                n_rows=jnp.int32(nr), n_fin_rows=jnp.int32(nfr),
                n_fin_kmers=jnp.int32(nfk))
        return self
