"""BriskData — user-facing generic-payload index (`Brisk<DATA>`,
reference Brisk.hpp:23-42).

Each k-mer carries `width` uint32 payload lanes merged under static
per-lane kinds (index.payload). The counter is the width-1, ("sum",)
special case (api.Brisk keeps its own leaner store). The canonical
width-2 instantiation is count + last-position: kinds ("sum", "max")
with ascending positions.

The reference's update model is get() -> mutate DATA* under
protect/unprotect locks (Brisk.hpp:63-97); the functional TPU analog is
batched upsert: update() appends (key, payload) rows and the next
compaction merges them under the lane kinds — lock-free, one device
program per batch.
"""

from typing import Iterator, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from brisk_tpu.index import payload, readout, store
from brisk_tpu.io import fasta
from brisk_tpu.oracle import pyref
from brisk_tpu.ops import enumerate as enum_ops
from brisk_tpu.params import Parameters

U32 = np.uint32


class BriskData:
    """Dynamic k-mer -> (D uint32 lanes) index with batched
    insert/get/update and merge-on-compact semantics."""

    def __init__(self, params: Parameters, width: int = 2,
                 kinds: Tuple[str, ...] = None, window: int = 256,
                 capacity: int = 1 << 14):
        if kinds is None:
            kinds = ("sum",) + ("max",) * (width - 1)
        assert len(kinds) == width
        assert kinds[0] == "sum", \
            "lane 0 is the count lane (nonzero = live entry)"
        self.params = params
        self.width = width
        self.kinds = tuple(kinds)
        self.window = window
        self.W = store.key_words(params.k, params.b)
        self.state = payload.empty(capacity, self.W, width)
        self.n_emitted = 0

    # -- insertion -----------------------------------------------------------

    def insert_sequence(self, seq: str, extra: np.ndarray = None) -> None:
        """Insert every k-mer of `seq`. Payload lane 0 gets +1 (count);
        lanes 1.. take `extra` ((width-1, n_kmers) uint32, indexed by
        k-mer start position). Default extra: the start position itself
        on every lane — with the default ("sum", "max") kinds that is
        count + LAST occurrence position."""
        p = self.params
        n_k = len(seq) - p.k + 1
        if n_k <= 0:
            return
        if extra is None:
            extra = np.broadcast_to(
                np.arange(n_k, dtype=U32), (self.width - 1, n_k))
        assert extra.shape == (self.width - 1, n_k)

        packer = fasta.BatchPacker(p.k, 1, self.window)
        carry = enum_ops.zero_carry(1)
        offset = 0
        for bt in packer.pack(iter([seq])):
            em, carry = enum_ops.enumerate_batch(
                jnp.asarray(bt.codes, dtype=jnp.uint32),
                jnp.asarray(bt.fresh), jnp.asarray(bt.valid_end), carry,
                k=p.k, m=p.m, b=p.b)
            rows = store.make_keys(em.bucket.reshape(-1),
                                   em.key.reshape(4, -1),
                                   em.mini_idx.reshape(-1), p.k, p.b)
            valid = em.valid.reshape(-1)
            L_out = int(em.valid.shape[1])
            vals = np.zeros((self.width, L_out), dtype=U32)
            take = min(L_out, n_k - offset)
            vals[0, :take] = 1
            vals[1:, :take] = extra[:, offset:offset + take]
            offset += take
            self.state = payload.ensure_room(self.state, L_out)
            self.state = payload.append(self.state, rows,
                                        jnp.asarray(vals), valid)
            self.n_emitted += bt.n_kmers
        self.compact()

    def update(self, kmers, values: np.ndarray) -> None:
        """Batched upsert: merge `values` ((D, n) uint32) into the entries
        of the given k-mer strings under the lane kinds (new keys are
        inserted). The functional replacement for the reference's
        protect_data -> mutate -> unprotect_data cycle."""
        values = np.asarray(values, dtype=U32)
        assert values.shape == (self.width, len(kmers))
        cols = np.stack([self._pack(km) for km in kmers], axis=1)
        self.state = payload.ensure_room(self.state, len(kmers))
        self.state = payload.append(self.state, jnp.asarray(cols),
                                    jnp.asarray(values),
                                    jnp.ones(len(kmers), dtype=bool))
        self.compact()

    def compact(self) -> None:
        self.state = payload.compact(self.state, self.kinds)

    # -- lookup --------------------------------------------------------------

    def _pack(self, kmer: str) -> np.ndarray:
        p = self.params
        if len(kmer) != p.k:
            raise ValueError(f"need a {p.k}-mer, got {len(kmer)} bases")
        dede = pyref.DecyclingSet(p.m)
        km = pyref.str2kmer_record(kmer, p.m, dede)
        key = pyref.hash_kmer_minimizer(km.kmer, km.minimizer_idx, p.m,
                                        dede)
        slice_hash = pyref.bfc_hash_64(
            (km.kmer >> (2 * km.minimizer_idx)) & p.m_mask, p.m_mask, dede)
        bucket = pyref.bucket_id(slice_hash, p)
        return store.pack_key_np(bucket, key, km.minimizer_idx, p.k, p.b)

    def get(self, kmer: str) -> Optional[Tuple[int, ...]]:
        """All D payload lanes of one k-mer, or None (orientation-
        sensitive keying, like Brisk::get, Brisk.hpp:63-69)."""
        cols = self._pack(kmer)[:, None]
        found, vals = payload.lookup(self.state, jnp.asarray(cols))
        if bool(found[0]):
            return tuple(int(v) for v in np.asarray(vals)[:, 0])
        return None

    def items(self) -> Iterator[Tuple[int, Tuple[int, ...]]]:
        """(kmer_value, (lane0, .., laneD-1)) per stored entry."""
        n = int(self.state.n_sorted)
        tmp = store.IndexState(self.state.keys,
                               jnp.ones(self.state.keys.shape[1], U32),
                               self.state.n_sorted, self.state.n_used)
        _, hi, lo, _, _ = readout.entries_u64(tmp, self.params)
        data = np.asarray(self.state.data)[:, :n]
        for i in range(n):
            kv = (int(hi[i]) << 64) | int(lo[i])
            yield kv, tuple(int(x) for x in data[:, i])

    # -- maintenance ---------------------------------------------------------

    def reallocate(self) -> None:
        """m += 2, b += 2 re-keying with payload lanes carried; collapsing
        entries merge under the lane kinds (the reference keeps an
        arbitrary one, Brisk.hpp:219 — see index.rekey's deviation
        note)."""
        from brisk_tpu.index import rekey
        p = self.params
        new = Parameters(k=p.k, m=p.m + 2, b=min(p.b + 2, 15))
        self.compact()
        n = int(self.state.n_sorted)
        tmp = store.IndexState(self.state.keys,
                               jnp.ones(self.state.keys.shape[1], U32),
                               self.state.n_sorted, self.state.n_used)
        _, hi, lo, _, _ = readout.entries_u64(tmp, p)
        vals = np.asarray(self.state.data)[:, :n]
        out = payload.empty(max(1 << 10, int(2 ** np.ceil(
            np.log2(max(n, 1) * 2)))), store.key_words(new.k, new.b),
            self.width)
        batch = 1 << 16
        for s in range(0, n, batch):
            e = min(s + batch, n)
            codes = rekey._codes_from_values(hi[s:e], lo[s:e], new.k)
            rows = rekey._rekey_batch(jnp.asarray(codes), k=new.k,
                                      m=new.m, b=new.b)
            out = payload.ensure_room(out, rows.shape[1])
            out = payload.append(out, rows, jnp.asarray(vals[:, s:e]),
                                 jnp.ones(rows.shape[1], dtype=bool))
        self.state = payload.compact(out, self.kinds)
        self.params = new

    # -- persistence ---------------------------------------------------------

    def save(self, path: str) -> None:
        self.compact()
        np.savez_compressed(
            path, keys=np.asarray(self.state.keys),
            data=np.asarray(self.state.data),
            n_sorted=int(self.state.n_sorted),
            n_used=int(self.state.n_used),
            k=self.params.k, m=self.params.m, b=self.params.b,
            kinds=np.array(self.kinds), n_emitted=self.n_emitted)

    @classmethod
    def load(cls, path: str, **kw) -> "BriskData":
        z = np.load(path if path.endswith(".npz") else path + ".npz")
        params = Parameters(k=int(z["k"]), m=int(z["m"]), b=int(z["b"]))
        kinds = tuple(str(x) for x in z["kinds"])
        self = cls(params, width=len(kinds), kinds=kinds,
                   capacity=z["keys"].shape[1], **kw)
        self.state = payload.PayloadState(
            keys=jnp.asarray(z["keys"]), data=jnp.asarray(z["data"]),
            n_sorted=jnp.int32(int(z["n_sorted"])),
            n_used=jnp.int32(int(z["n_used"])))
        self.n_emitted = int(z["n_emitted"])
        return self
