"""Genome-recovery check for a community assembly.

For each source genome: the fraction of its 32-mer windows whose
canonical form appears in the assembled contigs (exact k-mer recall -
a strict, alignment-free recovery measure).

Usage: python scripts/check_recovery.py COMMUNITY_DIR CONTIGS_FA
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from megahit_tpu.core import kmerops, packing
from megahit_tpu.graph.counter import pack_flat, window_valid_mask
from megahit_tpu.io.contig_io import read_contigs

K = 32


def seq_kmers_u64(codes_list) -> np.ndarray:
    """Canonical K-mer u64s of every window of every sequence."""
    flat, starts = packing.pack_many(codes_list)
    n_bases = int(starts[-1])
    if n_bases < K:
        return np.zeros(0, np.uint64)
    packed = np.concatenate([pack_flat(flat), np.zeros(3, np.uint32)])
    keys = kmerops.extract_all_kmers(packed, K)[:n_bases]
    canon, _ = kmerops.canonical_kmers(np.asarray(keys), K)
    u = kmerops.keys_to_u64_words(np.asarray(canon))
    return u[window_valid_mask(starts, K, n_bases)]


def read_fasta_codes(path: str) -> np.ndarray:
    parts = []
    with open(path) as fh:
        for line in fh:
            if not line.startswith(">"):
                parts.append(line.strip())
    lut = np.zeros(256, np.uint8)
    lut[np.frombuffer(b"ACGT", np.uint8)] = np.arange(4)
    return lut[np.frombuffer("".join(parts).encode(), np.uint8)]


def main() -> None:
    comm, contigs_fa = sys.argv[1], sys.argv[2]
    contigs = [c.codes for c in read_contigs(contigs_fa)]
    table = np.unique(seq_kmers_u64(contigs))

    manifest = json.load(open(os.path.join(comm, "manifest.json")))
    rows = []
    for m in manifest:
        g = read_fasta_codes(
            os.path.join(comm, f"genome_{m['genome']}.fa"))
        q = seq_kmers_u64([g])
        idx = np.searchsorted(table, q)
        idx = np.minimum(idx, len(table) - 1)
        rec = float((table[idx] == q).mean()) if len(q) else 0.0
        rows.append(rec)
        print(f"genome {m['genome']:>3} {m['bp']:>8} bp "
              f"cov {m['cov']:>6.2f}x -> {100 * rec:6.2f}% "
              f"{K}-mer recall")
    print(f"mean {100 * np.mean(rows):.2f}%, "
          f"worst {100 * min(rows):.2f}%")


if __name__ == "__main__":
    main()
