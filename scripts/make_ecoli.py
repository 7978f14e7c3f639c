"""Reproducible synthetic "E. coli scale" benchmark dataset.

Generates a random 4.6 Mbp genome and ~131 Mbp of 150 bp paired-end
reads (insert ~300 +/- 25) — the dataset used for the end-to-end
wall-time tables in RESULTS.md (both assemblers read the same files).

Usage:
    python scripts/make_ecoli.py OUTDIR [--genome-bp 4600000]
        [--read-bp 131000000] [--error 0.0] [--seed 0]

Writes OUTDIR/genome.fa, OUTDIR/reads_1.fa, OUTDIR/reads_2.fa.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
COMP = np.zeros(256, dtype=np.uint8)
COMP[np.frombuffer(b"ACGT", dtype=np.uint8)] = np.frombuffer(
    b"TGCA", dtype=np.uint8
)


def write_fasta(path: str, seqs: np.ndarray, prefix: str) -> None:
    """seqs: (n, L) uint8 ASCII array."""
    n, L = seqs.shape
    with open(path, "wb") as fh:
        chunk = 4096
        for lo in range(0, n, chunk):
            hi = min(lo + chunk, n)
            parts = []
            for i in range(lo, hi):
                parts.append(b">" + f"{prefix}{i}".encode() + b"\n")
                parts.append(seqs[i].tobytes() + b"\n")
            fh.write(b"".join(parts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--genome-bp", type=int, default=4_600_000)
    ap.add_argument("--read-bp", type=int, default=131_000_000)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--insert", type=int, default=300)
    ap.add_argument("--insert-sd", type=int, default=25)
    ap.add_argument("--error", type=float, default=0.0)
    ap.add_argument("--seed", type=int, default=0)
    a = ap.parse_args()

    rng = np.random.default_rng(a.seed)
    os.makedirs(a.outdir, exist_ok=True)

    genome = BASES[rng.integers(0, 4, size=a.genome_bp)]
    write_fasta(os.path.join(a.outdir, "genome.fa"),
                genome[None, :], "genome")

    n_pairs = a.read_bp // (2 * a.read_len)
    ins = rng.normal(a.insert, a.insert_sd, n_pairs).astype(np.int64)
    ins = np.clip(ins, a.read_len + 10, a.insert + 6 * a.insert_sd)
    starts = rng.integers(0, a.genome_bp - ins.max() - 1, n_pairs)

    idx1 = starts[:, None] + np.arange(a.read_len)[None, :]
    r1 = genome[idx1]
    ends = starts + ins
    idx2 = ends[:, None] - 1 - np.arange(a.read_len)[None, :]
    r2 = COMP[genome[idx2]]

    if a.error > 0:
        for r in (r1, r2):
            m = rng.random(r.shape) < a.error
            subs = BASES[rng.integers(0, 4, size=int(m.sum()))]
            r[m] = subs

    write_fasta(os.path.join(a.outdir, "reads_1.fa"), r1, "r")
    write_fasta(os.path.join(a.outdir, "reads_2.fa"), r2, "r")
    print(f"wrote {n_pairs} pairs x 2 x {a.read_len} bp "
          f"({2 * n_pairs * a.read_len / 1e6:.0f} Mbp) to {a.outdir}")


if __name__ == "__main__":
    main()
