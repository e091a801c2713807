"""ShardedBrisk — the multi-chip user facade (SURVEY §5.8, VERDICT r1 #5c).

The single-chip `api.Brisk` on a `jax.sharding.Mesh`: record lanes are
data-parallel across shards, the index is sharded by reduced minimizer
(bucket % n_shards), and emissions ride a capacity-bounded all_to_all to
their owner shard with skew overflow spilling to the source shard
(parallel.sharded). The reference's whole-machine analog is one process
of OpenMP threads + a mutexed bucket matrix (DenseMenuYo.hpp:110-118);
this facade is the pod-scale replacement the blueprint demands.

Insertion (k <= 32) uses the fused sequence-parallel window pipeline:
records are split into overlapping windows (io.windows) across ALL
global lanes, a stack of S window batches runs as one device program
(sharded.sharded_insert_windows), and the rare uncertified windows are
re-run exactly through the streaming carry path on the host's default
device and delivered to their owner shards via a host-built routing
buffer (sharded.sharded_append_buf). k > 32 falls back to the streaming
BatchPacker path (sharded.sharded_insert_step).

Capacity contracts are HOST-enforced: appends consume a fixed number of
raw log slots per step, tracked host-side as an upper bound so the hot
loop never reads back n_used; compaction/growth happen only when the
bound approaches capacity.
"""

from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import readout, store
from brisk_tpu.io import fasta, windows
from brisk_tpu.oracle import pyref
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.params import Parameters
from brisk_tpu.parallel import sharded

U32 = np.uint32
_INVALID = U32(0xFFFFFFFF)


class ShardedBrisk:
    """Dynamic k-mer -> count index sharded over a device mesh."""

    def __init__(self, params: Parameters, mesh=None, n_devices: int = None,
                 batch_per_shard: int = 64, window: int = 256,
                 stack: int = 4, route_cap: int = None,
                 capacity: int = 1 << 16):
        if mesh is None:
            mesh = sharded.make_mesh(n_devices or len(jax.devices()))
        self.mesh = mesh
        self.params = params
        self.n_shards = mesh.shape["x"]
        self.B_local = batch_per_shard
        self.B = self.n_shards * batch_per_shard
        self.window = window
        self.stack = stack
        # default: every emission of a step fits even if one shard owns all
        self.route_cap = route_cap or batch_per_shard * window
        self.W = store.key_words(params.k, params.b)
        self.state = sharded.sharded_empty(self.n_shards, capacity, mesh,
                                           self.W)
        self._n_used_ub = 0     # host upper bound on max-shard n_used
        self.n_emitted = 0
        self.n_superkmers = 0
        self.n_spilled = 0
        self.n_repaired_windows = 0

    # -- capacity (host-enforced; see sharded_insert_windows contract) ------

    def _cap(self) -> int:
        return self.state.keys.shape[2]

    def _sync_used(self) -> None:
        self._n_used_ub = int(jnp.max(self.state.n_used))

    def _compact(self) -> None:
        self.state = sharded.sharded_compact(self.state, self.mesh)
        self._sync_used()

    def _ensure_room(self, raw_per_shard: int) -> None:
        if self._n_used_ub + raw_per_shard <= self._cap():
            return
        self._compact()
        cap = self._cap()
        while self._n_used_ub + raw_per_shard > cap:
            cap *= 2
        if cap != self._cap():
            self.state = sharded.sharded_grow(self.state, cap, self.mesh)

    # -- insertion -----------------------------------------------------------

    def insert_file(self, path: str) -> None:
        p = self.params
        if p.k <= 32:
            self._insert_windowed(self._records(path))
        else:
            self._insert_streaming(
                fasta.fasta_batches(path, p.k, self.B, self.window))
        self._compact()

    def insert_sequence(self, seq: str) -> None:
        p = self.params
        if p.k <= 32:
            self._insert_windowed(iter([seq]))
        else:
            packer = fasta.BatchPacker(p.k, self.B, self.window)
            self._insert_streaming(packer.pack(iter([seq])))
        self._compact()

    def _records(self, path: str):
        from brisk_tpu import native
        chunks = native.parse_fasta_codes(path)
        if chunks is not None:
            return iter(chunks)
        return pyref.read_fasta_chunks(path)

    # streaming path (k > 32): one record per lane, carry across batches
    def _insert_streaming(self, batches) -> None:
        p = self.params
        carry = enum_ops.zero_carry(self.B)
        per_step = (self.n_shards * self.route_cap
                    + self.B_local * self.window)
        for bt in batches:
            self._ensure_room(per_step)
            self.state, carry, stats = sharded.sharded_insert_step(
                self.state, jnp.asarray(bt.codes, dtype=jnp.uint32),
                jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end), carry,
                k=p.k, m=p.m, b=p.b, mesh=self.mesh,
                route_cap=self.route_cap)
            self._n_used_ub += per_step
            self.n_emitted += bt.n_kmers
            self.n_spilled += int(stats.n_spilled)
            self.n_superkmers += int(stats.n_boundaries) + int(
                np.sum(np.asarray(bt.fresh) & (np.asarray(bt.valid_end) > 0)))

    # fused window path (k <= 32)
    def _insert_windowed(self, records) -> None:
        p = self.params
        packer = windows.WindowPacker(p.k, p.m, self.B, l_out=self.window)
        self._prev_tail = None
        S, B, L_buf = self.stack, self.B, packer.l_buf
        pending = []
        for bt in packer.pack(records):
            pending.append(bt)
            if len(pending) == S:
                self._flush_stack(packer, pending)
                pending = []
        if pending:
            while len(pending) < S:  # pad to the compiled stack shape
                pending.append(windows.WinBatch(
                    np.zeros((B, L_buf), np.uint8),
                    np.zeros(B, np.int32), np.zeros(B, np.int32), 0, 0,
                    np.full(B, -1, np.int64), np.zeros(B, np.int32)))
            self._flush_stack(packer, pending)

    def _flush_stack(self, packer, batches) -> None:
        p = self.params
        S, B = len(batches), self.B
        codes = np.stack([bt.codes for bt in batches])
        vs = np.stack([bt.valid_start for bt in batches])
        ve = np.stack([bt.valid_end for bt in batches])
        per_flush = S * (self.n_shards * self.route_cap
                         + self.B_local * packer.l_out)
        self._ensure_room(per_flush)
        (self.state, n_sk, n_km, n_sp, cert,
         ends) = sharded.sharded_insert_windows(
            self.state, jnp.asarray(codes), jnp.asarray(vs),
            jnp.asarray(ve), k=p.k, m=p.m, b=p.b, mesh=self.mesh,
            route_cap=self.route_cap)
        self._n_used_ub += per_flush
        self.n_emitted += int(n_km)
        self.n_spilled += int(n_sp)
        self.n_superkmers += int(n_sk) + sum(bt.n_records for bt in batches)

        # exact repair of uncertified windows (io.windows re-sync failures)
        cert_f = np.asarray(cert).reshape(-1)
        rec_f = np.concatenate([bt.rec for bt in batches])
        win_f = np.concatenate([bt.win for bt in batches])
        ends_f = [np.asarray(x).reshape(S * B) for x in ends]
        failed = np.nonzero((~cert_f) & (rec_f >= 0))[0]
        repaired_ends = {}
        repaired_rows = []  # host uint32 (N, W) row lists

        def end_of(j):
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
            end7, rows_np = self._rerun_window(packer, batches[s], lane,
                                               carry7)
            repaired_ends[int(j)] = end7
            repaired_rows.append(rows_np)
            self.n_repaired_windows += 1

        live = np.nonzero(rec_f >= 0)[0]
        if len(live):
            j = int(live[-1])
            self._prev_tail = (int(rec_f[j]), int(win_f[j]), end_of(j))

        if repaired_rows:
            self._deliver_rows(np.concatenate(repaired_rows, axis=0))

    def _rerun_window(self, packer, bt, lane, carry7):
        """Exact re-run of one window through the streaming carry path,
        seeded with the true machine state at the end of the previous
        window. Returns (end7, valid packed-key rows (N, W) uint32)."""
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
        valid = np.asarray(em.valid.reshape(-1))
        rows_np = np.asarray(rows).T[valid]
        self.n_emitted += int(valid.sum())
        self.n_superkmers += int(jnp.sum(em.boundary & em.valid))
        end7 = tuple(np.asarray(x)[0] for x in end)
        return end7, rows_np

    def _deliver_rows(self, rows_np: np.ndarray) -> None:
        """Route host-built (N, W) packed-key rows to their owner shards
        via one sharded_append_buf call."""
        p = self.params
        bucket, _, _, _ = store.unpack_keys_np(rows_np.T, p.k, p.b)
        dest = bucket % U32(self.n_shards)
        cap_r = max(int(np.bincount(dest, minlength=self.n_shards).max()), 1)
        buf = np.full((self.n_shards, cap_r, self.W), _INVALID, dtype=U32)
        for d in range(self.n_shards):
            rd = rows_np[dest == d]
            buf[d, :len(rd)] = rd
        self._ensure_room(cap_r)
        self.state = sharded.sharded_append_buf(
            self.state, jax.device_put(
                jnp.asarray(buf),
                jax.sharding.NamedSharding(self.mesh,
                                           jax.sharding.PartitionSpec("x"))),
            self.mesh)
        self._n_used_ub += cap_r

    # -- lookup ----------------------------------------------------------------

    def get(self, kmer: str) -> Optional[int]:
        """Count of one k-mer (orientation-sensitive, like api.Brisk.get /
        Brisk::get, Brisk.hpp:63-69), summed across shards."""
        p = self.params
        if len(kmer) != p.k:
            raise ValueError(f"need a {p.k}-mer, got {len(kmer)} bases")
        dede = pyref.DecyclingSet(p.m)
        km = pyref.str2kmer_record(kmer, p.m, dede)
        key = pyref.hash_kmer_minimizer(km.kmer, km.minimizer_idx, p.m, dede)
        slice_hash = pyref.bfc_hash_64(
            (km.kmer >> (2 * km.minimizer_idx)) & p.m_mask, p.m_mask, dede)
        bucket = pyref.bucket_id(slice_hash, p)
        cols = store.pack_key_np(bucket, key, km.minimizer_idx,
                                 p.k, p.b)[:, None]
        found, vals = sharded.sharded_lookup(self.state, jnp.asarray(cols),
                                             self.mesh)
        if int(found[0]):
            return int(vals[0]) % 256
        return None

    def get_canonical(self, kmer: str) -> Optional[int]:
        c = self.get(kmer)
        if c is not None:
            return c
        p = self.params
        rc = pyref.num2str(pyref.revcomp(pyref.str2num(kmer), p.k), p.k)
        return self.get(rc)

    def query_file(self, path: str) -> int:
        """Sum of stored counts over every k-mer emission of a query FASTA
        (reference query_fasta, counter.cpp:314-346); lookups ride
        sharded_lookup so spill placement is invisible."""
        p = self.params
        total = 0
        carry = enum_ops.zero_carry(self.B)
        for bt in fasta.fasta_batches(path, p.k, self.B, self.window):
            em, carry = enum_ops.enumerate_batch(
                jnp.asarray(bt.codes, dtype=jnp.uint32),
                jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end),
                carry, k=p.k, m=p.m, b=p.b)
            rows = store.make_keys(em.bucket.reshape(-1),
                                   em.key.reshape(4, -1),
                                   em.mini_idx.reshape(-1), p.k, p.b)
            found, vals = sharded.sharded_lookup(self.state, rows, self.mesh)
            total += int(jnp.sum(jnp.where(
                (found > 0) & em.valid.reshape(-1), vals % 256, 0)))
        return total

    # -- enumeration / stats -----------------------------------------------

    def items(self) -> Iterator[Tuple[int, int]]:
        """(kmer_value, count mod 256) per stored entry, shard by shard.
        A key split between its owner and spill shards appears once per
        holding shard; counts_dict() aggregates."""
        params = self.params
        for d in range(self.n_shards):
            local = store.IndexState(self.state.keys[d], self.state.data[d],
                                     self.state.n_sorted[d],
                                     self.state.n_used[d])
            kmers, counts, _ = readout.entries(local, params)
            for kv, c in zip(kmers, counts):
                yield int(kv), int(c) % 256

    def counts_dict(self) -> dict:
        agg = {}
        for kv, c in self.items():
            agg[kv] = (agg.get(kv, 0) + c) % 256
        return agg

    def stats(self) -> dict:
        n_sorted = np.asarray(self.state.n_sorted)
        data = np.asarray(self.state.data)
        n_live = sum(int(np.count_nonzero(data[d, :n_sorted[d]]))
                     for d in range(self.n_shards))
        key_bytes = self.state.keys.nbytes + self.state.data.nbytes
        return dict(n_shards=self.n_shards, nb_kmers=n_live,
                    nb_superkmers=self.n_superkmers,
                    nb_emitted=self.n_emitted,
                    n_spilled=self.n_spilled,
                    n_repaired_windows=self.n_repaired_windows,
                    shard_entries=[int(x) for x in n_sorted],
                    index_bytes=key_bytes,
                    bytes_per_kmer=(key_bytes / n_live) if n_live else 0.0)

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        """Sharded checkpoint: per-shard arrays with the shard axis kept,
        so load() re-places them on any mesh of the same shard count."""
        self._compact()
        np.savez_compressed(
            path,
            keys=np.asarray(self.state.keys),
            data=np.asarray(self.state.data),
            n_sorted=np.asarray(self.state.n_sorted),
            n_used=np.asarray(self.state.n_used),
            k=self.params.k, m=self.params.m, b=self.params.b,
            n_emitted=self.n_emitted, n_superkmers=self.n_superkmers,
            n_spilled=self.n_spilled)

    @classmethod
    def load(cls, path: str, mesh=None, **kw) -> "ShardedBrisk":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        params = Parameters(k=int(z["k"]), m=int(z["m"]), b=int(z["b"]))
        n_shards = z["keys"].shape[0]
        if mesh is None:
            mesh = sharded.make_mesh(n_shards)
        assert mesh.shape["x"] == n_shards, \
            f"checkpoint has {n_shards} shards, mesh has {mesh.shape['x']}"
        self = cls(params, mesh=mesh, capacity=z["keys"].shape[2], **kw)
        sh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("x"))
        self.state = store.IndexState(
            keys=jax.device_put(jnp.asarray(z["keys"]), sh),
            data=jax.device_put(jnp.asarray(z["data"]), sh),
            n_sorted=jax.device_put(jnp.asarray(z["n_sorted"]), sh),
            n_used=jax.device_put(jnp.asarray(z["n_used"]), sh))
        self._sync_used()
        self.n_emitted = int(z["n_emitted"])
        self.n_superkmers = int(z["n_superkmers"])
        self.n_spilled = int(z["n_spilled"])
        return self
