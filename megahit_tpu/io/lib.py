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

from ..core import packing
from .fastx import read_fastx


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
        np.savez_compressed(
            path,
            flat_codes=self.flat_codes,
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
        return cls(z["flat_codes"], z["starts"], ranges)


def build_lib(
    pe1: list[str],
    pe2: list[str],
    pe12: list[str],
    se: list[str],
) -> SequenceLib:
    """Read all libraries into one SequenceLib.

    Order matches the reference driver's lib file generation
    (src/megahit:667-697): pe12 first, then pe1/pe2 pairs, then se.
    """
    seqs: list[np.ndarray] = []
    ranges: list[tuple[int, int, bool]] = []

    for path in pe12:
        begin = len(seqs)
        seqs.extend(read_fastx(path))
        ranges.append((begin, len(seqs), True))

    for p1, p2 in zip(pe1, pe2):
        begin = len(seqs)
        for a, b in zip(read_fastx(p1), read_fastx(p2)):
            seqs.append(a)
            seqs.append(b)
        ranges.append((begin, len(seqs), True))

    for path in se:
        begin = len(seqs)
        seqs.extend(read_fastx(path))
        ranges.append((begin, len(seqs), False))

    flat, starts = packing.pack_many(seqs)
    return SequenceLib(flat, starts, ranges)
