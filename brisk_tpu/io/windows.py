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
