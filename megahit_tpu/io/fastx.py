"""FASTA/FASTQ reading with gzip/bzip2 support and N-trimming.

Replaces the reference's kseq-based FastxReader + decompression FIFOs
(reference src/sequence/io/fastx_reader.cpp, src/megahit:700-745). The
N-trimming rule matches FastxReader::TrimN (fastx_reader.cpp:56-71):
keep only the FIRST maximal run of non-N characters.
"""

from __future__ import annotations

import bz2
import gzip
import io
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..core import packing


@dataclass
class FastxRecord:
    name: str
    seq: bytes  # raw ASCII


def _open(path: str):
    with open(path, "rb") as probe:
        magic = probe.read(3)
    if magic[:2] == b"\x1f\x8b":
        return gzip.open(path, "rb")
    if magic == b"BZh":
        return bz2.open(path, "rb")
    return open(path, "rb")


def iter_fastx(path: str) -> Iterator[FastxRecord]:
    """Stream records from a (possibly compressed) FASTA or FASTQ file."""
    with _open(path) as fh:
        yield from _iter_fastx_stream(io.BufferedReader(fh, 1 << 20))


def _iter_fastx_stream(fh) -> Iterator[FastxRecord]:
    first = fh.peek(1)[:1]
    if not first:
        return
    if first == b">":
        name = None
        chunks: list[bytes] = []
        for line in fh:
            line = line.rstrip()
            if line.startswith(b">"):
                if name is not None:
                    yield FastxRecord(name, b"".join(chunks))
                name = line[1:].split()[0].decode() if len(line) > 1 else ""
                chunks = []
            elif line:
                chunks.append(line)
        if name is not None:
            yield FastxRecord(name, b"".join(chunks))
    elif first == b"@":
        while True:
            raw = fh.readline()
            if not raw:  # EOF (a blank line is just skipped)
                return
            hdr = raw.rstrip()
            if not hdr:
                continue
            seq = fh.readline().rstrip()
            fh.readline()  # +
            fh.readline()  # qual
            name = hdr[1:].split()[0].decode() if len(hdr) > 1 else ""
            yield FastxRecord(name, seq)
    else:
        raise ValueError(f"not FASTA/FASTQ (starts with {first!r})")


_NOT_N = np.zeros(256, dtype=bool)
for _c in b"ACGTacgt":
    _NOT_N[_c] = True


def trim_n(seq: bytes) -> bytes:
    """Keep the first maximal run of non-N characters (reference TrimN)."""
    arr = np.frombuffer(seq, dtype=np.uint8)
    good = _NOT_N[arr]
    if good.all():
        return seq
    idx = np.flatnonzero(good)
    if len(idx) == 0:
        return b""
    b = idx[0]
    bad_after = np.flatnonzero(~good[b:])
    e = b + bad_after[0] if len(bad_after) else len(seq)
    return seq[b:e]


def read_fastx_flat(
    path: str, do_trim_n: bool = True
) -> tuple[np.ndarray, np.ndarray]:
    """Read a whole file into pool form (flat_codes, starts).

    Uses the native C++ parser (megahit_tpu.native) when available -
    the reference's host I/O core is C++ too (kseq + SequencePackage);
    falls back to the Python line parser."""
    from .. import native

    with _open(path) as fh:
        data = fh.read()
    out = native.parse_fastx_buffer_flat(data, trim_n=do_trim_n)
    if out is not None:
        return out
    seqs = []
    for rec in _iter_fastx_bytes(data):
        s = trim_n(rec.seq) if do_trim_n else rec.seq
        seqs.append(packing.encode(s))
    return packing.pack_many(seqs)


def read_fastx(path: str, do_trim_n: bool = True) -> list[np.ndarray]:
    """Read all sequences from a file as a list of uint8 code arrays."""
    codes, starts = read_fastx_flat(path, do_trim_n)
    return [codes[starts[i] : starts[i + 1]]
            for i in range(len(starts) - 1)]


def _iter_fastx_bytes(data: bytes):
    import io as _io

    fh = _io.BufferedReader(_io.BytesIO(data), 1 << 20)
    yield from _iter_fastx_stream(fh)
