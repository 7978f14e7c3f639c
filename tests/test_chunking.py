"""Multi-chunk regression: results must not depend on chunk size.

Guards the chunk-seam bug where word-aligned slices cover up to 15
offsets past the chunk boundary and duplicated k-mers at every seam
(only visible with more than one chunk)."""

import numpy as np

from megahit_tpu.core import packing
from megahit_tpu.graph import counter
from megahit_tpu.graph.iterate import build_flank_index, find_next_kmers
from megahit_tpu.graph.mercy import find_mercy_edges

RNG = np.random.default_rng(321)


def test_counter_chunked_equals_single_chunk():
    reads = [RNG.integers(0, 4, size=int(L)).astype(np.uint8)
             for L in RNG.integers(40, 150, 300)]
    flat, starts = packing.pack_many(reads)
    k1 = 22
    ref_k, ref_c = counter.count_canonical_kmers(flat, starts, k1, 1)
    # tiny chunks: many seams (chunk floor is 1<<16 bases)
    got_k, got_c = counter.count_canonical_kmers(
        flat, starts, k1, 1, batch_windows=1 << 16
    )
    np.testing.assert_array_equal(ref_k, got_k)
    np.testing.assert_array_equal(ref_c, got_c)


def test_mercy_chunked_equals_single_chunk():
    genome = RNG.integers(0, 4, size=2000).astype(np.uint8)
    reads = []
    tiles = list(range(0, 1900, 70))
    for j, i in enumerate(tiles):
        reads.append(genome[i : i + 100].copy())
        if j % 5 != 2:
            reads.append(genome[i : i + 100].copy())
    flat, starts = packing.pack_many(reads)
    k1 = 22
    keys, _ = counter.count_canonical_kmers(flat, starts, k1, 2)
    ref = find_mercy_edges(flat, starts, keys, k1)
    got = find_mercy_edges(flat, starts, keys, k1, chunk_bases=1 << 16)
    np.testing.assert_array_equal(ref, got)


def test_iterate_chunked_equals_single_chunk():
    k, step = 21, 10
    genome = RNG.integers(0, 4, size=3000).astype(np.uint8)
    contigs = [genome[i : i + 400].copy() for i in range(0, 2800, 350)]
    idx = build_flank_index(contigs, [2.0] * len(contigs), k, step)
    reads = [genome[s : s + 80].copy() for s in range(0, 2900, 5)]
    flat, starts = packing.pack_many(reads)
    rk, rm = find_next_kmers(flat, starts, idx)
    gk, gm = find_next_kmers(flat, starts, idx, chunk_bases=1 << 16)
    np.testing.assert_array_equal(rk, gk)
    np.testing.assert_array_equal(rm, gm)
