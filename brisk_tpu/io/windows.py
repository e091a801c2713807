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
"""

from dataclasses import dataclass
from typing import Iterator, Union

import numpy as np


@dataclass
class WinBatch:
    codes: np.ndarray        # (B, L_buf) uint8 2-bit codes
    valid_start: np.ndarray  # (B,) int32: first valid emission position
    valid_end: np.ndarray    # (B,) int32: one past last valid position
    n_kmers: int             # total valid emissions in this batch
    n_records: int           # records STARTING in this batch (window 0 here)
    rec: np.ndarray = None   # (B,) int64: record serial per lane (-1 empty)
    win: np.ndarray = None   # (B,) int32: window index within the record


def default_warmup(k: int, m: int) -> int:
    return 2 * (k - m + 1)


class WindowPacker:
    """Packs records into (B, L_buf) window batches for enumerate_batch
    with valid_start masking (all lanes fresh, no carry)."""

    def __init__(self, k: int, m: int, batch: int, l_out: int = 256,
                 warmup: int = None):
        if warmup is None:
            warmup = default_warmup(k, m)
        assert l_out % 16 == 0, "l_out must be a multiple of the scan chunk"
        assert warmup < l_out, "warmup must leave room for useful emissions"
        self.k = k
        self.margin = k - 1
        self.batch = batch
        self.l_out = l_out
        self.l_buf = self.margin + l_out
        self.warmup = warmup
        self.useful = l_out - warmup

    def record_windows(self, codes: np.ndarray):
        """One record (uint8 2-bit codes, len >= k) -> (windows (n_win,
        L_buf) uint8, valid_start (n_win,), valid_end (n_win,))."""
        n = len(codes)
        margin, useful, warmup = self.margin, self.useful, self.warmup
        n_k = n - margin
        w0 = warmup + useful
        n_win = 1 if n_k <= w0 else 1 + -(-(n_k - w0) // useful)
        need = (n_win - 1) * useful + self.l_buf
        if need > n:
            codes = np.pad(codes, (0, need - n))
        wins = np.lib.stride_tricks.sliding_window_view(
            codes, self.l_buf)[::useful][:n_win]
        valid_start = np.full(n_win, margin + warmup, dtype=np.int32)
        valid_start[0] = margin
        valid_end = np.minimum(
            n - useful * np.arange(n_win, dtype=np.int64), self.l_buf
        ).astype(np.int32)
        return wins, valid_start, valid_end

    def pack(self, records: Iterator[Union[str, np.ndarray]]
             ) -> Iterator[WinBatch]:
        """records: ACGT strings or uint8 code arrays (from the native
        parser). Records shorter than k are dropped (reference
        count_sequence, counter.cpp:233)."""
        B, L_buf = self.batch, self.l_buf

        def fresh_buffers():
            return (np.zeros((B, L_buf), dtype=np.uint8),
                    np.zeros(B, dtype=np.int32),
                    np.zeros(B, dtype=np.int32),
                    np.full(B, -1, dtype=np.int64),
                    np.zeros(B, dtype=np.int32))

        codes, vs, ve, rid, wid = fresh_buffers()
        fill = 0
        n_records = 0
        serial = 0
        for rec in records:
            if len(rec) < self.k:
                continue
            if isinstance(rec, str):
                raw = np.frombuffer(rec.encode(), dtype=np.uint8)
                rec = (raw >> 1) & np.uint8(3)
            wins, wvs, wve = self.record_windows(rec)
            n_records += 1
            pos = 0
            while pos < len(wins):
                take = min(B - fill, len(wins) - pos)
                codes[fill:fill + take] = wins[pos:pos + take]
                vs[fill:fill + take] = wvs[pos:pos + take]
                ve[fill:fill + take] = wve[pos:pos + take]
                rid[fill:fill + take] = serial
                wid[fill:fill + take] = np.arange(pos, pos + take)
                fill += take
                pos += take
                if fill == B:
                    yield WinBatch(codes, vs, ve, int(np.sum(ve - vs)),
                                   n_records, rid, wid)
                    codes, vs, ve, rid, wid = fresh_buffers()
                    fill = 0
                    n_records = 0
            serial += 1
        if fill:
            # empty trailing lanes: valid_start == valid_end == 0, rec == -1
            yield WinBatch(codes, vs, ve,
                           int(np.sum(np.maximum(ve - vs, 0))),
                           n_records, rid, wid)
