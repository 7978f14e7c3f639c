"""Contig-flank iterate step: junction-spanning edge seeding."""

import numpy as np

from megahit_tpu.core import packing
from megahit_tpu.graph.iterate import build_flank_index, find_next_kmers

RNG = np.random.default_rng(5)


def canon(codes):
    a = packing.decode(codes)
    b = packing.decode(packing.revcomp_codes(codes))
    return min(a, b)


def test_flank_index_dedup_keeps_longest_ext():
    k, step = 21, 10
    base = RNG.integers(0, 4, size=22).astype(np.uint8)
    c_short = np.concatenate([base, RNG.integers(0, 4, 3).astype(np.uint8)])
    c_long = np.concatenate([c_short[:25], RNG.integers(0, 4, 20).astype(np.uint8)])
    idx = build_flank_index([c_short, c_long], [1.0, 2.0], k, step)
    # both contigs share the forward flank; the longer extension wins
    row = None
    want = packing.pack_codes(base)[:2]
    for i in range(idx.size):
        if (idx.keys[i] == want).all():
            row = i
    assert row is not None
    assert idx.ext_len[row] == step - 1
    assert idx.mul[row] == 2.0


def test_junction_edges_emitted():
    k, step = 21, 10
    k1, k2 = k + 1, k + step + 1
    genome = RNG.integers(0, 4, size=200).astype(np.uint8)
    contigs = [genome[:100].copy(), genome[78:].copy()]
    idx = build_flank_index(contigs, [5.0, 7.0], k, step)

    reads = [genome[s : s + 60].copy() for s in range(0, 141, 3)]
    flat, starts = packing.pack_many(reads)
    keys, muls = find_next_kmers(flat, starts, idx)

    got = {
        canon(packing.unpack_words(keys[i], k2)) for i in range(len(keys))
    }
    # flanks at the junction (contig2 start = genome pos 78) mark
    # positions 69..87 via the two strands' extensions; runs of step+1
    # emit exactly the windows a in [69, 77]
    want = {canon(genome[a : a + k2]) for a in range(69, 78)}
    assert got == want
    # junction edges carry multiplicity 0, matching the reference
    # (FlankInfo.mul is never set, contig_flank_index.h:64 - see
    # iterate.py module docstring)
    assert (muls == 0).all()


def test_no_contigs_no_edges():
    k, step = 21, 10
    idx = build_flank_index([], [], k, step)
    reads = [RNG.integers(0, 4, 80).astype(np.uint8)]
    flat, starts = packing.pack_many(reads)
    keys, muls = find_next_kmers(flat, starts, idx)
    assert len(keys) == 0


def test_chunk_boundary_no_duplicate_hits():
    """Hits inside the 16-base word-aligned chunk overlap must emit
    once: results with a tiny chunk must equal the single-chunk run
    (regression: duplicated hpos rows broke the greedy-skip order)."""
    k, step = 21, 10
    genome = RNG.integers(0, 4, size=300_000).astype(np.uint8)
    # junction pairs scattered so flank hits land near 64K boundaries
    contigs = [genome[s : s + 400].copy()
               for s in range(0, len(genome) - 400, 360)]
    idx = build_flank_index(contigs, [2.0] * len(contigs), k, step)
    reads = [genome[s : s + 120].copy()
             for s in range(0, len(genome) - 120, 37)]
    flat, starts = packing.pack_many(reads)
    big = find_next_kmers(flat, starts, idx, chunk_bases=1 << 30)
    small = find_next_kmers(flat, starts, idx, chunk_bases=1 << 16)
    assert np.array_equal(big[0], small[0])
    assert np.array_equal(big[1], small[1])
    assert len(big[0]) > 0
