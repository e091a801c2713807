"""Sequence-parallel window packing (SURVEY §5.7).

The reference scans one record per thread (counter.cpp:212-226), so one
long chromosome occupies one thread; round 1's BatchPacker likewise pinned
each record to one device lane. Here a record is split into OVERLAPPING
fixed-size windows spread across all lanes: window i covers bases
[i*useful, i*useful + L_buf) and re-derives the enumerator state during a
warm-up replay region before its first valid emission, so a single record
fills the whole machine.

Warm-up correctness: the enumerator's minimizer state machine RESETS
(expiry rescan, or strict-improvement install) at least once every k-m+1
positions — `pos` increments monotonically between resets and expiry fires
when it exceeds k-m — and immediately after a reset the state is a pure
function of window-local precomputed data. A replay of warmup >= 2*(k-m+1)
positions therefore re-synchronizes the windowed machine with the
sequential one before its first valid emission wherever the k-mer window
minimum is unique (m odd excludes palindromic m-mers, so `rev` cannot
diverge). Where the minimum is NOT unique (adversarial repeats, e.g.
poly-A runs), the re-synced state can disagree on WHICH equal-hash copy is
the minimizer — a mini_idx / super-k-mer-boundary phase difference only.

For k > 32 the unique-minimum argument is defeated by the reference's
truncation quirk (Kmers.cpp:371: the expiry rescan hashes the k-mer's low
64 bits only, so the machine's minimum is not the true window minimum).
Those lanes are certified by END-STATE EQUALITY instead: the replayed
state at valid_start-1 is compared with the predecessor window's exact
end state inside the same device program (pipeline._chain_exact) — state
agreement there implies the replay re-derived the true sequential state,
truncation and all. Lanes that certify neither way are repaired exactly
(api.Brisk._repair_window). Bit-exactness incl. mini_idx on typical data
is covered by tests/test_windows.py.

PACKED TRANSPORT (round 4): window codes travel host->device packed 4
bases/byte (`codes4`). The tunneled TPU link moves ~13 MB/s, and at one
byte per base the transfer dominated e2e insert (4.1 s of a 4.0 s insert
at 50 Mb); packing at the RECORD level (one pass, then strided views)
cuts H2D 4x. Window starts stay byte-aligned by keeping `useful`
divisible by 4 (warmup is rounded up to a multiple of 4). The device
program unpacks with three shifts (pipeline._unpack4_device); repairs
and tests read the lazy `WinBatch.codes` property (host unpack).
"""

from dataclasses import dataclass, field
from typing import Iterator, Union

import numpy as np


def pack4(codes: np.ndarray) -> np.ndarray:
    """2-bit codes (..., L) uint8 -> packed (..., ceil(L/4)) uint8, base
    i of a byte in bits [2i, 2i+2) (first base lowest)."""
    L = codes.shape[-1]
    pad = (-L) % 4
    if pad:
        codes = np.concatenate(
            [codes, np.zeros(codes.shape[:-1] + (pad,), np.uint8)], axis=-1)
    c = codes.reshape(codes.shape[:-1] + (-1, 4))
    return (c[..., 0] | (c[..., 1] << 2) | (c[..., 2] << 4)
            | (c[..., 3] << 6)).astype(np.uint8)


def unpack4(packed: np.ndarray, l: int) -> np.ndarray:
    """Packed (..., L4) uint8 -> 2-bit codes (..., l) uint8."""
    out = np.empty(packed.shape[:-1] + (packed.shape[-1] * 4,), np.uint8)
    out[..., 0::4] = packed & 3
    out[..., 1::4] = (packed >> 2) & 3
    out[..., 2::4] = (packed >> 4) & 3
    out[..., 3::4] = (packed >> 6) & 3
    return out[..., :l]


@dataclass
class WinBatch:
    codes4: np.ndarray       # (B, l_buf4) uint8, 4 bases/byte
    valid_start: np.ndarray  # (B,) int32: first valid emission position
    valid_end: np.ndarray    # (B,) int32: one past last valid position
    n_kmers: int             # total valid emissions in this batch
    n_records: int           # records STARTING in this batch (window 0 here)
    rec: np.ndarray = None   # (B,) int64: record serial per lane (-1 empty)
    win: np.ndarray = None   # (B,) int32: window index within the record
    l_buf: int = 0           # unpacked buffer length in bases
    _codes: np.ndarray = field(default=None, repr=False, compare=False)

    @property
    def codes(self) -> np.ndarray:
        """Unpacked (B, l_buf) uint8 codes — lazy host unpack, for the
        repair paths / tests / CPU-mesh facade (the hot path ships
        codes4 and unpacks on device)."""
        if self._codes is None:
            l = self.l_buf or self.codes4.shape[-1] * 4
            self._codes = unpack4(self.codes4, l)
        return self._codes


def default_warmup(k: int, m: int) -> int:
    # rounded up to a multiple of 4 so `useful` stays 4-divisible and
    # window starts stay byte-aligned in the packed transport
    w = 2 * (k - m + 1)
    return -(-w // 4) * 4


@dataclass
class FlatFlush:
    """One flush of the FLAT transport (round 5): windows are NOT
    materialized on host — the flush ships one contiguous packed chunk
    per stack and the device builds the overlapping window lanes itself
    (pipeline.insert_flat_sklnative) via reshape/concat, no gather.
    Window j of the flush covers chunk bases [j*useful, j*useful+l_buf);
    records are aligned to `useful` boundaries so windows never span two
    records' emission ranges (a window's buffer MAY read into the next
    record's bases past its valid_end — harmless: the enumerator is a
    forward scan and emissions beyond valid_end are masked)."""
    chunk4: np.ndarray       # ((SB+ext)*useful4,) uint8 packed chunk
    valid_start: np.ndarray  # (SB,) int32
    valid_end: np.ndarray    # (SB,) int32
    rec: np.ndarray          # (SB,) int64 record serial per window (-1 pad)
    win: np.ndarray          # (SB,) int32 window index within record
    n_kmers: int
    n_records: int           # records STARTING in this flush
    l_buf: int
    useful: int
    _codes: np.ndarray = field(default=None, repr=False, compare=False)

    @property
    def codes(self) -> np.ndarray:
        """(SB, l_buf) unpacked per-window code view (repairs/tests only;
        the hot path never materializes this). Zero-copy strided view of
        the unpacked chunk."""
        if self._codes is None:
            flat = unpack4(self.chunk4, self.chunk4.shape[0] * 4)
            sb = self.valid_start.shape[0]
            self._codes = np.lib.stride_tricks.sliding_window_view(
                flat, self.l_buf)[::self.useful][:sb]
        return self._codes


class WindowPacker:
    """Packs records into (B, l_buf4) PACKED window batches for
    enumerate_batch with valid_start masking (all lanes fresh, no
    carry)."""

    def __init__(self, k: int, m: int, batch: int, l_out: int = 256,
                 warmup: int = None):
        if warmup is None:
            warmup = default_warmup(k, m)
        assert l_out % 16 == 0, "l_out must be a multiple of the scan chunk"
        assert warmup % 4 == 0, "warmup must be 4-divisible (packed lanes)"
        assert warmup < l_out, "warmup must leave room for useful emissions"
        self.k = k
        self.margin = k - 1
        self.batch = batch
        self.l_out = l_out
        self.l_buf = self.margin + l_out
        self.l_buf4 = -(-self.l_buf // 4)
        self.warmup = warmup
        self.useful = l_out - warmup
        assert self.useful % 4 == 0

    def record_windows(self, codes: np.ndarray):
        """One record (uint8 2-bit codes, len >= k) -> (PACKED windows
        (n_win, l_buf4) uint8, valid_start (n_win,), valid_end (n_win,)).
        The record is packed ONCE; windows are strided views of the
        packed array (window starts are i*useful, 4-aligned)."""
        n = len(codes)
        margin, useful, warmup = self.margin, self.useful, self.warmup
        n_k = n - margin
        w0 = warmup + useful
        n_win = 1 if n_k <= w0 else 1 + -(-(n_k - w0) // useful)
        need = (n_win - 1) * useful + 4 * self.l_buf4
        if need > n:
            codes = np.pad(codes, (0, need - n))
        rec4 = pack4(codes)
        wins4 = np.lib.stride_tricks.sliding_window_view(
            rec4, self.l_buf4)[::useful // 4][:n_win]
        valid_start = np.full(n_win, margin + warmup, dtype=np.int32)
        valid_start[0] = margin
        valid_end = np.minimum(
            n - useful * np.arange(n_win, dtype=np.int64), self.l_buf
        ).astype(np.int32)
        return wins4, valid_start, valid_end

    def n_windows(self, rec_len: int) -> int:
        """Number of overlapping windows covering a record (>= k bases)."""
        n_k = rec_len - self.margin
        if n_k <= self.l_out:
            return 1
        return 1 + -(-(n_k - self.l_out) // self.useful)

    def pack_flat(self, records: Iterator[Union[str, np.ndarray]],
                  stack: int) -> Iterator[FlatFlush]:
        """FLAT transport (round 5, VERDICT r4 item 1): instead of
        materializing each overlapping window on host (a ~119k-iteration
        Python copy loop per 50 Mb — the measured host wall of round 4's
        insert stage), records are copied ONCE into a `useful`-aligned
        flat buffer per flush and packed 4 bases/byte; the device builds
        the window lanes itself. Each base crosses the host->device
        tunnel exactly once (up to record-alignment padding)."""
        B, u, l_buf = self.batch, self.useful, self.l_buf
        SB = stack * B
        u4 = u // 4
        lb4 = self.l_buf4
        nparts = -(-lb4 // u4)
        ext = nparts - 1  # extra useful-rows holding the last window tail
        chunk_bases = (SB + ext) * u

        records = iter(records)
        cur = None          # active record's codes
        cur_win = 0         # slots of `cur` already emitted
        cur_nw = 0          # real windows of `cur`
        cur_ns = 0          # slots reserved for `cur` (incl. dead gap
        #                     slots: the record's bases span ceil(L/u)
        #                     aligned slots, and the NEXT record must
        #                     start past them — a record's last-window
        #                     tail overflows its window-count span by up
        #                     to margin+warmup bases)
        serial = 0
        exhausted = False
        while not (exhausted and cur is None):
            flat = np.zeros(chunk_bases, dtype=np.uint8)
            vs = np.zeros(SB, dtype=np.int32)
            ve = np.zeros(SB, dtype=np.int32)
            rid = np.full(SB, -1, dtype=np.int64)
            wid = np.zeros(SB, dtype=np.int32)
            slot = 0
            n_records = 0
            while slot < SB:
                if cur is None:
                    if exhausted:
                        break
                    try:
                        c = next(records)
                    except StopIteration:
                        exhausted = True
                        continue
                    if len(c) < self.k:
                        continue
                    if isinstance(c, str):
                        raw = np.frombuffer(c.encode(), dtype=np.uint8)
                        c = (raw >> 1) & np.uint8(3)
                    cur = c
                    cur_win = 0
                    cur_nw = self.n_windows(len(c))
                    cur_ns = max(cur_nw, -(-len(c) // u))
                take = min(SB - slot, cur_ns - cur_win)
                n_real = max(0, min(cur_win + take, cur_nw) - cur_win)
                # bases for slots [cur_win, cur_win+take): record span
                # [cur_win*u, (cur_win+take-1)*u + l_buf), clamped
                src_lo = cur_win * u
                src_hi = min(len(cur), (cur_win + take - 1) * u + l_buf)
                dst_lo = slot * u
                flat[dst_lo:dst_lo + (src_hi - src_lo)] = cur[src_lo:src_hi]
                if n_real:
                    sl = slice(slot, slot + n_real)
                    vs[sl] = self.margin + self.warmup
                    if cur_win == 0:
                        vs[slot] = self.margin
                        n_records += 1
                    ve[sl] = np.minimum(
                        len(cur) - u * np.arange(cur_win,
                                                 cur_win + n_real,
                                                 dtype=np.int64),
                        l_buf).astype(np.int32)
                    rid[sl] = serial
                    wid[sl] = np.arange(cur_win, cur_win + n_real)
                slot += take
                cur_win += take
                if cur_win == cur_ns:
                    cur = None
                    serial += 1
            if slot == 0:
                return
            yield FlatFlush(pack4(flat), vs, ve, rid, wid,
                            int(np.sum(np.maximum(ve - vs, 0))),
                            n_records, l_buf, u)

    def pack(self, records: Iterator[Union[str, np.ndarray]]
             ) -> Iterator[WinBatch]:
        """records: ACGT strings or uint8 code arrays (from the native
        parser). Records shorter than k are dropped (reference
        count_sequence, counter.cpp:233)."""
        B, L4 = self.batch, self.l_buf4

        def fresh_buffers():
            return (np.zeros((B, L4), dtype=np.uint8),
                    np.zeros(B, dtype=np.int32),
                    np.zeros(B, dtype=np.int32),
                    np.full(B, -1, dtype=np.int64),
                    np.zeros(B, dtype=np.int32))

        codes4, vs, ve, rid, wid = fresh_buffers()
        fill = 0
        n_records = 0
        serial = 0
        for rec in records:
            if len(rec) < self.k:
                continue
            if isinstance(rec, str):
                raw = np.frombuffer(rec.encode(), dtype=np.uint8)
                rec = (raw >> 1) & np.uint8(3)
            wins4, wvs, wve = self.record_windows(rec)
            n_records += 1
            pos = 0
            while pos < len(wins4):
                take = min(B - fill, len(wins4) - pos)
                codes4[fill:fill + take] = wins4[pos:pos + take]
                vs[fill:fill + take] = wvs[pos:pos + take]
                ve[fill:fill + take] = wve[pos:pos + take]
                rid[fill:fill + take] = serial
                wid[fill:fill + take] = np.arange(pos, pos + take)
                fill += take
                pos += take
                if fill == B:
                    yield WinBatch(codes4, vs, ve, int(np.sum(ve - vs)),
                                   n_records, rid, wid, self.l_buf)
                    codes4, vs, ve, rid, wid = fresh_buffers()
                    fill = 0
                    n_records = 0
            serial += 1
        if fill:
            # empty trailing lanes: valid_start == valid_end == 0, rec == -1
            yield WinBatch(codes4, vs, ve,
                           int(np.sum(np.maximum(ve - vs, 0))),
                           n_records, rid, wid, self.l_buf)
