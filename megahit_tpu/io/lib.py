"""Sequence library building (reference `buildlib`,
src/sequence/io/sequence_lib.cpp:8-125).

A SequenceLib is the device-ready pool of all input reads: one flat 2-bit
packable code array + start offsets + per-library ranges. The on-disk
format is a single .npz (a deliberate redesign of the reference's
.bin/.lib_info pair, reference appendix: sequence_package.h:224-240) -
it carries the same information: per-lib (begin, end, max_len,
is_paired) and the packed reads.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np



@dataclass
class SequenceLib:
    """All reads, concatenated. Paired reads are interleaved (fwd, rev)."""

    flat_codes: np.ndarray  # (B,) uint8
    starts: np.ndarray  # (S+1,) int64
    lib_ranges: list[tuple[int, int, bool]] = field(default_factory=list)
    # (begin_seq, end_seq, is_paired) per library

    @property
    def num_seqs(self) -> int:
        return len(self.starts) - 1

    @property
    def num_bases(self) -> int:
        return int(self.starts[-1])

    @property
    def lengths(self) -> np.ndarray:
        return np.diff(self.starts)

    @property
    def max_len(self) -> int:
        return int(self.lengths.max()) if self.num_seqs else 0

    def seq(self, i: int) -> np.ndarray:
        return self.flat_codes[self.starts[i] : self.starts[i + 1]]

    def save(self, path: str) -> None:
        """2-bit packed on disk (the reference's .bin is 2-bit packed
        too, sequence_package.h:224-240); uncompressed npz - zlib on
        100M+ bases costs a minute for little gain over 2-bit."""
        n = len(self.flat_codes)
        nw = (n + 15) // 16
        padded = np.zeros(nw * 16, dtype=np.uint8)
        padded[:n] = self.flat_codes
        shifts = (30 - 2 * np.arange(16, dtype=np.uint32)).astype(np.uint32)
        packed = (
            (padded.reshape(nw, 16).astype(np.uint32) << shifts)
            .sum(axis=1, dtype=np.uint32)
        )
        np.savez(
            path,
            packed=packed,
            n_bases=np.int64(n),
            starts=self.starts,
            lib_ranges=np.array(
                [(b, e, int(p)) for b, e, p in self.lib_ranges], dtype=np.int64
            ).reshape(-1, 3),
        )

    @classmethod
    def load(cls, path: str) -> "SequenceLib":
        z = np.load(path)
        ranges = [
            (int(b), int(e), bool(p)) for b, e, p in z["lib_ranges"]
        ]
        if "flat_codes" in z:  # legacy uncompressed-codes format
            return cls(z["flat_codes"], z["starts"], ranges)
        packed = z["packed"].astype(np.uint32)
        n = int(z["n_bases"])
        shifts = (30 - 2 * np.arange(16, dtype=np.uint32)).astype(np.uint32)
        codes = ((packed[:, None] >> shifts) & 3).astype(np.uint8)
        return cls(codes.reshape(-1)[:n], z["starts"], ranges)


def _interleave_flat(f1, s1, f2, s2):
    """Interleave two sequence pools pairwise (r1_0, r2_0, r1_1, ...)
    with vectorized index arithmetic - no per-read Python loop."""
    if len(s1) != len(s2):
        # reference driver errors on mismatched -1/-2 read counts
        # (truncated/corrupt pair files must surface, not be masked)
        raise ValueError(
            "paired files have different read counts: "
            f"{len(s1) - 1} vs {len(s2) - 1}"
        )
    n = min(len(s1), len(s2)) - 1
    l1 = np.diff(s1[: n + 1])
    l2 = np.diff(s2[: n + 1])
    lens = np.empty(2 * n, dtype=np.int64)
    lens[0::2] = l1
    lens[1::2] = l2
    starts = np.zeros(2 * n + 1, dtype=np.int64)
    np.cumsum(lens, out=starts[1:])
    flat = np.empty(starts[-1], dtype=np.uint8)

    def place(src, src_starts, src_lens, tgt_starts):
        total = int(src_lens.sum())
        if total == 0:
            return
        # dest = tgt_start_i + (pos - src_start_i); the pool is gapless
        # so pos over all kept seqs is just arange(total)
        dest = (np.repeat(tgt_starts - src_starts[:-1], src_lens)
                + np.arange(total, dtype=np.int64))
        flat[dest] = src[:total]

    place(f1, s1[: n + 1], l1, starts[0:-1:2])
    place(f2, s2[: n + 1], l2, starts[1::2])
    return flat, starts


def build_lib(
    pe1: list[str],
    pe2: list[str],
    pe12: list[str],
    se: list[str],
) -> SequenceLib:
    """Read all libraries into one SequenceLib.

    Order matches the reference driver's lib file generation
    (src/megahit:667-697): pe12 first, then pe1/pe2 pairs, then se.
    All paths stay in flat pool form (native parser + vectorized
    interleave; no per-read Python objects).
    """
    from .async_reader import AsyncFastxReader

    pools: list[tuple[np.ndarray, np.ndarray]] = []
    ranges: list[tuple[int, int, bool]] = []
    n_seqs = 0

    def push(flat, starts, paired):
        nonlocal n_seqs
        cnt = len(starts) - 1
        pools.append((flat, starts))
        ranges.append((n_seqs, n_seqs + cnt, paired))
        n_seqs += cnt

    # one ordered stream with one file of read-ahead (the reference's
    # AsyncSequenceReader double buffering, async_sequence_reader.h)
    order = list(pe12)
    for p1, p2 in zip(pe1, pe2):
        order += [p1, p2]
    order += list(se)
    it = iter(AsyncFastxReader(order))

    for _ in pe12:
        _, flat, starts = next(it)
        push(flat, starts, True)
    for _ in zip(pe1, pe2):
        _, f1, s1 = next(it)
        _, f2, s2 = next(it)
        push(*_interleave_flat(f1, s1, f2, s2), True)
    for _ in se:
        _, flat, starts = next(it)
        push(flat, starts, False)

    if not pools:
        return SequenceLib(np.zeros(0, np.uint8), np.zeros(1, np.int64), [])
    flat = np.concatenate([p[0] for p in pools])
    starts = np.zeros(n_seqs + 1, dtype=np.int64)
    off_seq = 0
    off_base = 0
    for f, s in pools:
        cnt = len(s) - 1
        starts[off_seq + 1 : off_seq + cnt + 1] = s[1:] + off_base
        off_seq += cnt
        off_base += len(f)
    return SequenceLib(flat, starts, ranges)
